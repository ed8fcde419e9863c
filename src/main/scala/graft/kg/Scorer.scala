package graft.kg

import graft.core._

/** Sentiment scoring seam. The reference delegates to an LLM (bulk-chain,
  * arelight/run/infer.py:201-222) or a fine-tuned BERT; the engine ships a
  * deterministic lexicon scorer behind the same trait so the full pipeline is
  * reproducible, testable and network-free. The *decode* path is kept exactly:
  * the scorer emits a free-text response and Sentiment.decodeResponse applies
  * the reference's substring rules (arelight/run/infer.py:193-198).
  */
trait Scorer extends Serializable {

  /** Free-text response for one sample (the "LLM answer"). */
  def respond(sample: Sample): String

  final def score(sample: Sample): Prediction =
    Prediction(sample.id, Sentiment.decodeResponse(respond(sample)))
}

/** Deterministic lexicon scorer: counts positive vs negative cue words in the
  * cropped context window (excluding the entity terms themselves). Ties and
  * empty evidence are neutral. Word lists are fixed English cues plus the
  * synthetic generator's vocabulary so both corpora exercise all 3 classes. */
final case class LexiconScorer(
    positive: Set[String] = LexiconScorer.defaultPositive,
    negative: Set[String] = LexiconScorer.defaultNegative) extends Scorer {

  def respond(sample: Sample): String = {
    val entityIdx = sample.entities.toSet
    var pos = 0; var neg = 0
    var i = 0
    sample.terms.foreach { t =>
      if (!entityIdx.contains(i)) {
        val w = graft.text.TextOps.cueKey(t)
        if (positive.contains(w)) pos += 1
        else if (negative.contains(w)) neg += 1
      }
      i += 1
    }
    if (pos > neg) "The attitude is positive."
    else if (neg > pos) "The attitude is negative."
    else "The attitude is neutral."
  }
}

object LexiconScorer {
  val defaultPositive: Set[String] = Set(
    "good", "great", "praise", "praised", "support", "supports", "supported",
    "welcomed", "celebrated", "agreement", "ally", "allied", "friend",
    "cooperation", "helps", "helped", "progress", "win", "won", "fast", "big")
  val defaultNegative: Set[String] = Set(
    "bad", "attack", "attacked", "attacks", "condemn", "condemned", "condemns",
    "against", "war", "enemy", "threat", "threatened", "sanction", "sanctions",
    "crisis", "blame", "blamed", "lose", "lost", "slow", "small")
}
