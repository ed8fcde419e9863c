package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Concat-and-chunk sequence packing — the standard pretraining-data layout:
  * documents are concatenated in a fixed global order (by id) and the token
  * stream is cut every `chunkTokens` tokens; each document maps to the chunk
  * range its tokens land in. The output is the packing MANIFEST
  * (doc -> token offset -> chunk span), which is what a loader needs to
  * assemble training sequences without ever materializing the concatenation.
  *
  * The global running token offset is the one genuinely sequential quantity
  * here, and a naive `sum over (order by id)` window is a single-partition
  * scan — the classic 100 TB scale-killer (Spark warns "No Partition
  * Defined"). The scalable shape is the two-pass distributed prefix sum:
  *
  *   1. ids bucket into deterministic BLOCKS (id div blockSize); within each
  *      block the cumulative sum is a partitioned window — parallel across
  *      blocks, no global sort;
  *   2. per-block totals (one tiny row per block) get their own running
  *      offset on a relation of #blocks rows — negligible at any corpus size
  *      (10^12 docs / 2^20 block = 10^6 rows);
  *   3. a broadcast join adds the block offset back.
  *
  * The result is partitioning-invariant: offsets depend only on (id, tokens),
  * never on physical placement — so the manifest is reproducible and
  * oracle-checkable against a plain global-window mirror.
  *
  * Engine extension: no reference counterpart in /root/reference/arelight
  * (the reference emits per-sample prompts, the `arelight/sampler` package);
  * packing
  * is the downstream training-data shape SURVEY.md §6 plans for. */
object Packing {

  /** Packing manifest: (id, n_tokens, tok_start, chunk_first, chunk_last)
    * where tok_start is the exclusive prefix token count, chunk_first/last
    * the inclusive chunk-id span covered by this document's tokens.
    * Tokenization is whitespace (graft.ops.TextStats convention); `idCol`
    * must be unique non-null integral. */
  def packChunks(docs: DataFrame, textCol: Column, idCol: Column,
      chunkTokens: Int, blockSize: Long = 1 << 20): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    require(blockSize > 0, s"blockSize must be positive: $blockSize")
    // localCheckpoint: the tokenized (id, n_tokens) relation (16 bytes/row)
    // feeds BOTH the per-block window and the block-totals aggregate; without
    // the barrier each consumer re-runs the corpus tokenization whenever
    // exchange reuse doesn't fire (the prPrep/maxNormalize lesson)
    val base = docs.select(idCol.cast("long").as("id"),
      size(split(trim(textCol), raw"\s+")).cast("long").as("n_tokens"))
      .localCheckpoint()
    val blocked = base.withColumn("block", expr(s"id div ${blockSize}L"))
    val inBlock = blocked
      .withColumn("cum_in_block",
        sum(col("n_tokens")).over(
          Window.partitionBy(col("block")).orderBy(col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // #blocks rows: the only ordered window runs over this tiny relation;
    // totals aggregate the checkpointed base directly (no window re-run)
    val blockTotals = blocked.groupBy(col("block"))
      .agg(sum(col("n_tokens")).as("tot"))
      .withColumn("block_offset",
        coalesce(sum(col("tot")).over(
          Window.orderBy(col("block"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("block"), col("block_offset"))
    inBlock.join(broadcast(blockTotals), "block")
      .select(col("id"), col("n_tokens"),
        (col("block_offset") + col("cum_in_block") - col("n_tokens")).as("tok_start"))
      .withColumn("chunk_first", expr(s"tok_start div ${chunkTokens}L"))
      .withColumn("chunk_last",
        expr(s"(tok_start + n_tokens - 1) div ${chunkTokens}L"))
  }

  /** Sliding-window chunking with overlap — the RAG/context-window
    * counterpart of [[packChunks]] (which concatenates; this one SPLITS):
    * w-token chunks starting every `stride` tokens, stopping at the first
    * start that reaches the document end (so no fully-redundant tail
    * windows; docs at or under w tokens yield exactly one whole chunk).
    * Pure map-side flat-map — no shuffle, no state; chunk counts are exact
    * integer arithmetic mirrored in the oracle. Output:
    * (id, chunk_id, chunk, n_tokens). */
  def slidingChunks(df: DataFrame, text: Column, id: Column,
      w: Int, stride: Int): DataFrame = {
    require(w >= 1, s"window w must be >= 1: $w")
    require(stride >= 1 && stride <= w, s"stride must be in [1,w]: $stride")
    // terms materialized in its own projection: the transform lambda must
    // capture an ATTRIBUTE, not the split expression (outer-capture re-runs
    // the split per element — the Catalyst HOF trap)
    val toks = df.select(id.as("id"), split(trim(text), raw"\s+").as("terms"))
    val nchunks = when(size(col("terms")) <= w, lit(1L))
      .otherwise(expr(s"(size(terms) - $w + ${stride - 1}) div $stride") + 1L)
    toks
      .select(col("id"), posexplode(transform(
        sequence(lit(0L), nchunks - 1L),
        k => array_join(slice(col("terms"), (k * stride + 1).cast("int"), lit(w)), " "))))
      .toDF("id", "chunk_id", "chunk")
      .select(col("id"), col("chunk_id").cast("long").as("chunk_id"), col("chunk"),
        size(split(col("chunk"), " ")).cast("long").as("n_tokens"))
  }
}
