package graft.kg

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core.{Prediction, Sample, Sentiment}

/** Batched prompt-completion scoring — the reference's bulk-chain inference
  * shape (arelight/run/infer.py:201-222, utils.py:90-101: batch_size=10,
  * prompts from text_b, response decoded by substring). The model seam is
  * [[ChatModel]]; the network-free deterministic implementation is
  * [[EchoSentimentModel]] (an "LLM" that reads the prompt's own context window
  * and answers with the lexicon sentiment — same decision function as
  * LexiconScorer, asserted by BulkScorerSpec).
  *
  * Executors call the model once per `batchSize` prompts inside mapPartitions —
  * swap in a real client (bounded-concurrency HTTP, ONNX decoder, ...) without
  * touching the pipeline.
  */
trait ChatModel extends Serializable {
  def completeBatch(prompts: Seq[String]): Seq[String]
}

/** Deterministic fake LLM: extracts the context from the task prompt, ignores
  * `<<entity>>` renderings and role tags, counts cue words. */
final case class EchoSentimentModel(
    positive: Set[String] = LexiconScorer.defaultPositive,
    negative: Set[String] = LexiconScorer.defaultNegative) extends ChatModel {

  private val entity = raw"<<[^>]*>>( \[(SUBJECT|OBJECT)\])?".r

  def completeBatch(prompts: Seq[String]): Seq[String] = prompts.map { p =>
    val start = p.indexOf("Given text: ")
    val end = p.indexOf(" TASK:")
    val ctx = if (start >= 0 && end > start) p.substring(start + 12, end) else p
    val cleaned = entity.replaceAllIn(ctx, " ")
    var pos = 0; var neg = 0
    graft.text.TextOps.tokenize(cleaned).foreach { t =>
      val w = graft.text.TextOps.cueKey(t)
      if (positive.contains(w)) pos += 1 else if (negative.contains(w)) neg += 1
    }
    if (pos > neg) "positive" else if (neg > pos) "negative" else "neutral"
  }
}

object BulkScorer {

  /** Score samples through a ChatModel in fixed-size prompt batches. */
  def score(samples: Dataset[Sample], model: ChatModel, batchSize: Int = 10)(
      implicit spark: SparkSession): Dataset[Prediction] = {
    import spark.implicits._
    samples.mapPartitions(_.grouped(batchSize).flatMap { batch =>
      val responses = model.completeBatch(batch.map(_.textB))
      batch.zip(responses).map { case (s, r) =>
        Prediction(s.id, Sentiment.decodeResponse(r))
      }
    })
  }
}
