package graft.kg

import graft.core._

/** Context sampling: entity-pair candidate generation (reference J1+F1,
  * arelight/pipelines/data/annot_pairs_nolabel.py:13-47) fused with window
  * cropping, entity rendering and prompt templating (P10-P12,
  * arelight/samplers/cropped.py:9-16, arelight/entity.py:5-15).
  *
  * Everything here is row-local (per document): mentions of a sentence are
  * already co-located, so pair generation is a flatMap with NO shuffle and no
  * pair is ever materialized beyond the distance bound — the relational
  * range-self-join formulation would shuffle mentions twice for the same result.
  *
  * Pair semantics pinned by the reference fixture
  * (test/data/samples_and_predict-test.sqlite): for each sentence, every ORDERED
  * pair of DISTINCT mentions (by mention id, both directions), same sentence
  * (dist_in_sents=0), |s.ind - t.ind| <= distInTermsBound, and (engine rule,
  * see SURVEY.md §7.4) source/target must be in DIFFERENT synonym groups — a
  * same-group pair would be a self-opinion, an error upstream in the reference
  * (OpinionCollection error_on_duplicates/`error_on_synonym_end_missed`).
  * opinion_id is the per-document pair ordinal in generation order (sentences
  * ascending, then source mention index, then target mention index), matching
  * the fixture's ids 0..17; linkage_id is the ordinal within the opinion's
  * synonym-linkage group (fixture: 0).
  */
object Sampler {

  final case class Config(
      termsPerContext: Int = 50, // crop window size AND distance bound (CLI --terms-per-context, infer.py:61)
      distInTermsBound: Int = 50,
      promptTemplate: String = "{text}", // sample prompt (samplers/cropped.py:12)
      taskTemplate: String =
        "Given text: {text_a} TASK: Classify sentiment attitude of [SUBJECT] to [OBJECT]: positive, negative, neutral", // infer.py:212-219
      /** When false, textA/textB stay empty — column pruning for consumers
        * (e.g. the fused triples path) that never read the rendered prompts.
        * The flatMap is opaque to Catalyst, so pruning is an explicit knob. */
      renderText: Boolean = true,
      /** "prompted" = v0.25 `<<v>> [SUBJECT]` rendering (arelight/entity.py:5-15);
        * "masked" = v0.24/opennre `#S/#O/#E` masking (pinned byte-exact by
        * test/data/opennre-data-test-predict.sqlite text_a). Masked mode leaves
        * textB empty (the v0.24 PairTextProvider text_b is a separate crop not
        * reproduced here). */
      renderMode: String = "prompted")

  /** Render one term given its role (reference HighligtedEntitiesFormatter,
    * arelight/entity.py:5-15): subject and its synonyms -> `<<v>> [SUBJECT]`,
    * object and synonyms -> `<<v>> [OBJECT]`, other entities -> `<<v>>`. */
  private def render(term: String, role: Int): String = role match {
    case 1 => s"<<$term>> [SUBJECT]"
    case 2 => s"<<$term>> [OBJECT]"
    case 3 => s"<<$term>>"
    case _ => term
  }

  /** v0.24 masked rendering (fixture text_a, e.g. "#S крайне зависим от #O ..."). */
  private def renderMasked(term: String, role: Int): String = role match {
    case 1 => "#S"
    case 2 => "#O"
    case 3 => "#E"
    case _ => term
  }

  /** Crop a <=window term slice containing both pair endpoints, centered on the
    * pair span (the reference's crop_window_size; interior policy is
    * engine-defined as the AREkit provider is not vendored — SURVEY.md §7.4). */
  private[kg] def cropBounds(len: Int, a: Int, b: Int, window: Int): (Int, Int) = {
    val lo = math.min(a, b); val hi = math.max(a, b)
    val span = hi - lo + 1
    if (len <= window) (0, len)
    // span wider than the window: expand to the span so BOTH endpoints stay in
    // the sample (unreachable under reference configs, where the distance
    // bound equals the window — defensive consistency for window < bound)
    else if (span >= window) (lo, math.min(len, lo + span))
    else {
      val slack = window - span
      val start0 = lo - slack / 2
      val start = math.max(0, math.min(start0, len - window))
      (start, start + window)
    }
  }

  /** Generate all samples for one parsed document. Pure function — usable from
    * Dataset.flatMap and from tests without a SparkSession. Written
    * allocation-lean (index loops, one StringBuilder per sample): this is the
    * hottest loop of the engine — every (sentence, pair) of 10^12 documents. */
  def sampleDoc(doc: ParsedDoc, cfg: Config): Seq[Sample] = {
    val out = Seq.newBuilder[Sample]
    var opinionId = 0L
    doc.sentences.foreach { sent =>
      val ms = sent.mentions.toIndexedSeq
      val nm = ms.length
      if (nm >= 2) {
        val terms = sent.terms.toIndexedSeq
        var si = 0
        while (si < nm) {
          val s = ms(si)
          var ti = 0
          while (ti < nm) {
            val t = ms(ti)
            if (s.id != t.id && s.groupId != t.groupId &&
                math.abs(s.ind - t.ind) <= cfg.distInTermsBound) {
              val (start, end) = cropBounds(terms.length, s.ind, t.ind, cfg.termsPerContext)
              val inWindow = ms.filter(m => m.ind >= start && m.ind < end)
              val rawWindow = terms.slice(start, end)
              var textA = ""
              var textB = ""
              if (cfg.renderText) {
                val masked = cfg.renderMode == "masked"
                val sb = new java.lang.StringBuilder(rawWindow.length * 8)
                var i = start
                while (i < end) {
                  if (i > start) sb.append(' ')
                  // role: 0 plain, 1 subject(-synonym), 2 object(-synonym), 3 other entity
                  var role = 0
                  var k = 0
                  while (k < inWindow.length && role == 0) {
                    val m = inWindow(k)
                    if (m.ind == i) {
                      role = if (m.groupId == s.groupId) 1
                             else if (m.groupId == t.groupId) 2
                             else 3
                    }
                    k += 1
                  }
                  sb.append(if (masked) renderMasked(terms(i), role) else render(terms(i), role))
                  i += 1
                }
                if (masked) {
                  textA = sb.toString
                } else {
                  textA = cfg.promptTemplate.replace("{text}", sb.toString)
                  textB = cfg.taskTemplate.replace("{text_a}", textA)
                }
              }
              out += Sample(
                id = s"${doc.url}#$opinionId",
                docId = doc.url,
                textA = textA,
                textB = textB,
                sInd = s.ind - start,
                tInd = t.ind - start,
                opinionId = opinionId,
                linkageId = 0L,
                entities = inWindow.map(_.ind - start),
                entityValues = inWindow.map(_.value),
                entityTypes = inWindow.map(_.eType),
                sentInd = sent.sentInd,
                sValue = s.value,
                sType = s.eType,
                tValue = t.value,
                tType = t.eType,
                terms = rawWindow)
              opinionId += 1
            }
            ti += 1
          }
          si += 1
        }
      }
    }
    out.result()
  }
}
