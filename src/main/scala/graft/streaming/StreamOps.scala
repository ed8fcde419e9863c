package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Page, Triple}
import graft.kg.{KgPipeline, Scorer}
import graft.ner.Ner

/** Structured Streaming variants of the engine's operators.
  *
  * The reference is strictly bounded batch (SURVEY.md §2.8); these exist for
  * the continuous-ingest deployment shape: a pages stream (e.g. new crawl
  * segments landing in a table) flowing through the SAME row-local pipeline —
  * stateless, so it needs no watermark — plus watermarked event-stream
  * aggregations demonstrating tumbling windows and session windows.
  */
object StreamOps {

  /** Streaming KG: pages stream -> triples stream. Stateless row-local maps;
    * works under any trigger, exactly-once with a checkpointed sink. */
  def triplesStream(pages: Dataset[Page], ner: Ner, cfg: KgPipeline.Config, scorer: Scorer)(
      implicit spark: SparkSession): Dataset[Triple] =
    KgPipeline.triples(KgPipeline.samples(KgPipeline.parsePages(pages, ner, cfg), cfg), scorer)

  /** Tumbling 1h windowed counts per event type with a 2h watermark
    * (late data beyond the watermark is dropped, state is bounded). */
  def eventsHourly(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming graph-edge aggregation: windowed counts over the triple stream
    * keyed by (source, target, sent) — the continuous counterpart of the A1
    * edge multiplicity count (GraphBuilder.edges); each closed window emits a
    * force-graph edge increment. State bounded by the watermark; node keys
    * composed with the same TYPE.value rule (P17). */
  def edgesStream(triples: DataFrame, tsCol: String,
      window_ : String = "1 hour", watermark: String = "2 hours"): DataFrame =
    triples
      .withColumn("ts", col(tsCol).cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_),
        concat_ws(".", col("subjType"), graft.graph.GraphBuilder.cleanValueCol(col("subj"))).as("source"),
        concat_ws(".", col("objType"), graft.graph.GraphBuilder.cleanValueCol(col("obj"))).as("target"),
        col("pred").as("sent"))
      .agg(count(lit(1)).cast("double").as("c"))
      .select(col("window.start").as("window_start"), col("source"), col("target"),
        col("sent"), col("c"))

  /** Streaming exact dedup — the continuous-ingest counterpart of
    * graft.ops.Dedup.exact: keep the FIRST document per content hash, with
    * state bounded by the watermark (a duplicate arriving within the watermark
    * horizon is dropped even across micro-batches; later re-crawls of old
    * content re-enter, which is the standard bounded-state trade-off). */
  def dedupExactStream(docs: DataFrame, textCol: String, tsCol: String,
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("ts", col(tsCol).cast("timestamp"))
      .withColumn("text_hash", md5(col(textCol).cast("binary")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("text_hash")

  /** 30-minute-gap sessions per user via the native session_window operator
    * (the streaming counterpart of Relational.eventsSessions). */
  def eventsSessions(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))
}
