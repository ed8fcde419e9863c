package graft.kg

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.core._
import graft.ner.{Ner, NerOps}
import graft.text.TextOps

/** End-to-end KG construction over a `pages` table (BASELINE.json input_hint):
  *
  *   pages -> parsedDocs -> samples -> predictions -> triples -> graph
  *
  * Mirrors the reference's 5-stage pipeline (SURVEY.md §3.1) with one crucial
  * structural difference: stages 1-4 are ONE Dataset lineage with no shuffle
  * until graph aggregation. A document is parsed, pair-sampled and scored
  * entirely row-locally; the only shuffles in the whole job are the optional
  * synonym-dictionary build and the final groupBy of the graph edges — both on
  * already-aggregated, far smaller data. This is what lets the job scale
  * linearly with executors (north_rule scaling efficiency >= 0.8).
  */
object KgPipeline {

  final case class Config(
      sampler: Sampler.Config = Sampler.Config(),
      nerTypes: Set[String] = Set("ORG", "PERSON", "LOC", "GPE"), // arelight/run/utils.py:13
      splitter: String = "linesplit", // linesplit | sentence  (arelight/run/utils.py:16-25)
      extractFromHtml: Boolean = false)

  /** Stage 1a-1c: text -> sentences -> terms -> mentions (typed, row-local).
    * Mention ids are per-document ordinals over (sentInd, termInd) — deterministic
    * under resume (SURVEY.md §4.3), unlike the reference's global IdAssigner.
    * `groupId` assigns the synonym group inline (default: the shuffle-free hash
    * grouping, graft.link.Linker.hashGroupId) — fusing linking into the parse
    * pass avoids a second full materialization of every document. */
  def parsePages(pages: Dataset[Page], ner: Ner, cfg: Config,
      groupId: String => Long = graft.link.Linker.hashGroupId)(
      implicit spark: SparkSession): Dataset[ParsedDoc] = {
    import spark.implicits._
    pages.mapPartitions(_.map(p => parsePage(p, ner, cfg, groupId)))
  }

  /** Row-local parse of one page — pure, also usable without a SparkSession. */
  def parsePage(p: Page, ner: Ner, cfg: Config,
      groupId: String => Long = graft.link.Linker.hashGroupId): ParsedDoc = {
    val text = if (cfg.extractFromHtml) TextOps.extractText(p.html) else p.text
    val sents =
      if (cfg.splitter == "linesplit") TextOps.splitLines(text)
      else TextOps.splitSentences(text)
    // index loop, pre-sized output array (hot path: once per document of 10^12)
    var nextId = 0L
    val out = new Array[Sentence](sents.length)
    var i = 0
    while (i < sents.length) {
      val (terms, raw) = ner.tag(TextOps.tokenize(sents(i)))
      val kept = NerOps.filterTypes(raw, cfg.nerTypes)
      val mentions = kept.map { m =>
        val id = nextId; nextId += 1
        Mention(i, m.ind, m.value, m.eType, id, groupId = groupId(m.value))
      }
      out(i) = Sentence(i, terms, mentions)
      i += 1
    }
    ParsedDoc(p.url, p.lang, scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
  }

  /** Stage 1d+2: pair generation + context sampling (row-local flatMap). */
  def samples(docs: Dataset[ParsedDoc], cfg: Config)(
      implicit spark: SparkSession): Dataset[Sample] = {
    import spark.implicits._
    val sCfg = cfg.sampler
    docs.flatMap(d => Sampler.sampleDoc(d, sCfg))
  }

  /** Stage 3 standalone: predictions as their own relation (for external scorers
    * / the compatibility one-hot export). */
  def predictions(ss: Dataset[Sample], scorer: Scorer)(
      implicit spark: SparkSession): Dataset[Prediction] = {
    import spark.implicits._
    ss.map(scorer.score)
  }

  /** Stages 3+4 fused: samples scored in place — no samples⨝predictions shuffle.
    * The reference's positional zip (J3) is an incidental 1:1 id identity; fusing
    * preserves exactly that contract while staying embarrassingly parallel. */
  def triples(ss: Dataset[Sample], scorer: Scorer)(
      implicit spark: SparkSession): Dataset[Triple] = {
    import spark.implicits._
    ss.map { s =>
      val p = scorer.score(s)
      Triple(s.sValue, s.sType, Sentiment.name(p.label), s.tValue, s.tType,
        s.docId, s.sentInd, s.id)
    }
  }

  /** Fully fused fast path: pairs + crop + lexicon scoring -> triples with no
    * intermediate Sample rows and O(1) scoring per pair via per-sentence cue
    * prefix sums. Semantically identical to
    * `triples(samples(parsed, cfg), LexiconScorer(pos, neg))` (asserted by
    * KgPipelineSpec) — this is the 100 TB scan shape: one row-local flatMap,
    * minimal garbage per emitted triple. */
  def triplesFast(docs: Dataset[ParsedDoc], cfg: Config, scorer: LexiconScorer)(
      implicit spark: SparkSession): Dataset[Triple] = {
    import spark.implicits._
    val sCfg = cfg.sampler
    val pos = scorer.positive
    val neg = scorer.negative
    docs.flatMap { doc =>
      val out = Seq.newBuilder[Triple]
      var opinionId = 0L
      doc.sentences.foreach { sent =>
        val ms = sent.mentions.toIndexedSeq
        val nm = ms.length
        if (nm >= 2) {
          val terms = sent.terms.toIndexedSeq
          val n = terms.length
          // prefix sums of cue signs (+1 pos, -1 neg), entity positions zeroed
          val prefix = new Array[Int](n + 1)
          val entityAt = new Array[Boolean](n)
          ms.foreach(m => if (m.ind < n) entityAt(m.ind) = true)
          var i = 0
          while (i < n) {
            var v = 0
            if (!entityAt(i)) {
              val w = graft.text.TextOps.cueKey(terms(i))
              if (pos.contains(w)) v = 1 else if (neg.contains(w)) v = -1
            }
            prefix(i + 1) = prefix(i) + v
            i += 1
          }
          var si = 0
          while (si < nm) {
            val s = ms(si)
            var ti = 0
            while (ti < nm) {
              val t = ms(ti)
              if (s.id != t.id && s.groupId != t.groupId &&
                  math.abs(s.ind - t.ind) <= sCfg.distInTermsBound) {
                val (start, end) = Sampler.cropBounds(n, s.ind, t.ind, sCfg.termsPerContext)
                val score = prefix(end) - prefix(start)
                val label =
                  if (score > 0) Sentiment.Positive
                  else if (score < 0) Sentiment.Negative
                  else Sentiment.Neutral
                out += Triple(s.value, s.eType, Sentiment.name(label), t.value, t.eType,
                  doc.url, sent.sentInd, s"${doc.url}#$opinionId")
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

  /** Join variant (reference J3/J4 semantics: samples INNER JOIN predictions ON id)
    * for when predictions were materialized separately (resume, external model). */
  def triplesJoined(ss: Dataset[Sample], preds: Dataset[Prediction])(
      implicit spark: SparkSession): Dataset[Triple] = {
    import spark.implicits._
    ss.joinWith(preds, ss("id") === preds("id"), "inner").map { case (s, p) =>
      Triple(s.sValue, s.sType, Sentiment.name(p.label), s.tValue, s.tType,
        s.docId, s.sentInd, s.id)
    }
  }

  /** The reference's library read API record
    * (AREkitSamplesService.iter_samples_and_predict_sqlite3,
    * arelight/arekit/sample_service.py:27-68): per joined (sample, prediction)
    * row — {filename, text, s_val, t_val, s_type, t_type, label} with an
    * optional record filter. */
  def tripleRecords(ss: Dataset[Sample], preds: Dataset[Prediction],
      filterRecord: Option[org.apache.spark.sql.Column] = None)(
      implicit spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val joined = ss.join(preds.withColumnRenamed("id", "pid"), ss("id") === col("pid"), "inner")
      .select(
        col("docId").as("filename"),
        col("textA").as("text"),
        col("sValue").as("s_val"), col("tValue").as("t_val"),
        col("sType").as("s_type"), col("tType").as("t_type"),
        col("label"))
    filterRecord.map(joined.filter).getOrElse(joined)
  }

  /** Compatibility export of the reference's `contents` schema: list columns
    * comma-joined (SURVEY.md §1.2), for byte-level diffs against fixtures. */
  def contentsCompat(ss: Dataset[Sample])(implicit spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    ss.select(
      col("id"), col("docId").as("doc_id"), col("textA").as("text_a"),
      col("textB").as("text_b"), col("sInd").as("s_ind"), col("tInd").as("t_ind"),
      col("opinionId").as("opinion_id"), col("linkageId").as("linkage_id"),
      concat_ws(",", col("entities")).as("entities"),
      concat_ws(",", col("entityValues")).as("entity_values"),
      concat_ws(",", col("entityTypes")).as("entity_types"),
      col("sentInd").cast("string").as("sent_ind"))
  }

  /** Compatibility export of the one-hot prediction layout
    * (col_0=neutral, col_1=positive, col_2=negative — by-name contract,
    * arelight/arekit/sample_service.py:17-24). */
  def predictionsOneHot(preds: Dataset[Prediction])(implicit spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    preds.select(
      col("id"),
      when(col("label") === Sentiment.Neutral, 1).otherwise(0).as("col_0"),
      when(col("label") === Sentiment.Positive, 1).otherwise(0).as("col_1"),
      when(col("label") === Sentiment.Negative, 1).otherwise(0).as("col_2"))
  }
}
