package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent dedup state for CONTINUOUS ingest: the corpus is represented by
  * constant-size-per-document artifacts — its exact-content hashes and its
  * minhash band signatures — so each incoming batch is deduplicated against
  * the full corpus history without ever re-reading or re-minhashing corpus
  * text. At 100 TB the store is ~1e-4 of the corpus bytes and both probes are
  * equi-joins on a hash key (exact: md5; near: (band, sig) bucket), i.e. one
  * shuffle of the BATCH side against a bucketed store.
  *
  * Near-duplicate decision: a batch doc is dropped when it shares at least
  * `minBands` distinct band buckets with any single stored doc. P(band match)
  * = J^rowsPerBand per band, so `minBands` is the precision/recall knob that
  * replaces the exact-Jaccard verify (whose shingle sets would make the store
  * corpus-sized — the classic space/precision trade of signature-only LSH
  * state; batch-internal dedup with full verify still runs per batch via
  * [[Dedup.incrementalNearDups]] when texts are co-resident).
  *
  * The LSH parameters are PINNED in the store (`_params.json`): appending
  * signatures computed under different (bands, shingleW, rowsPerBand) would
  * silently destroy recall, so a mismatch fails fast — same discipline as
  * io.Checkpoint's n_buckets lineage pin.
  */
object SigStore {

  case class Params(bands: Int = 8, shingleW: Int = 3, rowsPerBand: Int = 2)

  private def sigsPath(store: String) = s"$store/sigs"
  private def hashesPath(store: String) = s"$store/hashes"
  private def paramsPath(store: String) = s"$store/_params.json"

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, store: String): Boolean =
    fs(spark, store).exists(new org.apache.hadoop.fs.Path(paramsPath(store)))

  private def writeParams(spark: SparkSession, store: String, p: Params): Unit = {
    val out = fs(spark, store).create(new org.apache.hadoop.fs.Path(paramsPath(store)), true)
    try out.write(
      s"""{"bands":${p.bands},"shingle_w":${p.shingleW},"rows_per_band":${p.rowsPerBand}}"""
        .getBytes("UTF-8"))
    finally out.close()
  }

  private def readParams(spark: SparkSession, store: String): Params = {
    val in = fs(spark, store).open(new org.apache.hadoop.fs.Path(paramsPath(store)))
    val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    def f(k: String) = s""""$k":(\\d+)""".r.findFirstMatchIn(s)
      .getOrElse(sys.error(s"malformed $store/_params.json: $s")).group(1).toInt
    Params(f("bands"), f("shingle_w"), f("rows_per_band"))
  }

  /** Pin-or-check: first append writes the params; later appends/probes must
    * match them exactly. */
  private def pinParams(spark: SparkSession, store: String, p: Params): Unit =
    if (!exists(spark, store)) writeParams(spark, store, p)
    else {
      val have = readParams(spark, store)
      require(have == p,
        s"signature store $store was built with $have, probe/append uses $p — " +
          "mixed LSH parameters silently destroy recall; use the stored parameters " +
          "or start a new store")
    }

  /** Append `docs`' exact hashes and band signatures to the store (creating
    * it if absent). Call AFTER the batch's own dedup decided what to keep. */
  def append(docs: DataFrame, text: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column, store: String,
      params: Params = Params()): Unit = {
    val spark = docs.sparkSession
    pinParams(spark, store, params)
    Dedup.minhashSignatures(docs, text, id, params.bands, params.shingleW, params.rowsPerBand)
      .write.mode(SaveMode.Append).parquet(sigsPath(store))
    // id rides along so [[compact]]'s retention can drop a retired doc's
    // exact-hash row too (the probe itself joins on text_hash only)
    docs.select(id.as("id"), md5(text.cast("binary")).as("text_hash")).distinct()
      .write.mode(SaveMode.Append).parquet(hashesPath(store))
  }

  /** Batch docs NOT already represented in the store: exact-content matches
    * are dropped first (anti-join on md5), then near-duplicates sharing >=
    * `minBands` band buckets with any one stored doc. Returns the surviving
    * rows of `batch` unchanged. */
  def filterNew(batch: DataFrame, text: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column, store: String,
      params: Params = Params(), minBands: Int = 1,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val spark = batch.sparkSession
    require(exists(spark, store), s"no signature store at $store")
    val have = readParams(spark, store)
    require(have == params,
      s"signature store $store was built with $have, probe uses $params")
    val noExact = batch.join(
      spark.read.parquet(hashesPath(store))
        .select(col("text_hash").as("__h")).distinct(),
      md5(text.cast("binary")) === col("__h"), "left_anti")
    val batchSigs = Dedup.minhashSignatures(noExact, text, id,
      params.bands, params.shingleW, params.rowsPerBand)
    val storeSigs = Dedup.cappedSigs(
      spark.read.parquet(sigsPath(store)), maxBucketSize)
      .select(col("id").as("__store_id"), col("band"), col("sig"))
    // shared-band count per (batch, stored) pair from ONE bucket join over the
    // capped store; minBands=1 degenerates to "any shared bucket"
    val flagged = batchSigs.select(col("band"), col("sig"), col("id").as("batch_id"))
      .join(storeSigs, Seq("band", "sig"))
      .groupBy("batch_id", "__store_id")
      .agg(countDistinct(col("band")).as("__nb"))
      .filter(col("__nb") >= minBands)
      .select("batch_id").distinct()
    noExact.join(flagged.withColumnRenamed("batch_id", "__bid"),
      id === col("__bid"), "left_anti")
  }

  /** Rewrite the store's accumulated per-batch parquet file-sets into ONE
    * deduplicated layout bucketed by the probe join key — sigs repartitioned
    * on (band, sig), hashes on text_hash — with `partitions` files each.
    * Continuous ingest appends one file-set per [[append]] forever (the
    * classic small-files failure: at per-minute cadence a year of ingest is
    * ~500k files whose listing dominates every probe), so run this at a
    * maintenance cadence of roughly every ~100 batches, or whenever the
    * file count per relation reaches a few hundred.
    *
    * Probe results are IDENTICAL pre/post: both probes have set semantics
    * (distinct/anti-join), so dropping duplicate rows only shrinks the join.
    * `dropIds` (a one-column `id` relation) optionally retires documents —
    * their band signatures and exact-hash rows are removed, so retired
    * content stops suppressing future ingests (retention requires a store
    * written by a version that records `id` in hashes; older stores fail
    * fast rather than half-retiring).
    *
    * Crash safety: the new layout is fully written to a temp dir before the
    * old dir is swapped out via rename. A crash in the window between the
    * two renames (old already moved to the backup dir, new not yet in
    * place) is healed at the START of the next compact()/probe-independent
    * recovery step: a missing live dir with a present backup is rolled back
    * to the backup before anything is deleted — so an interrupted
    * compaction always leaves a recoverable layout, never a half-deleted
    * one. Orphan temp dirs from a crash before the swap are cleared.
    *
    * Retention preconditions (hashes carrying `id`, no null ids from
    * mixed-era files) are validated on BOTH relations before EITHER swap
    * runs, so a failed validation can never retire one relation and not the
    * other (the half-retire state the guard exists to prevent). */
  def compact(spark: SparkSession, store: String, partitions: Int = 32,
      dropIds: Option[DataFrame] = None): Unit = {
    require(exists(spark, store), s"no signature store at $store")
    require(partitions >= 1, s"partitions=$partitions must be >= 1")
    val f = fs(spark, store)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    def recover(path: String): Unit = {
      val bak = s"$path.compact-bak"
      if (!f.exists(p(path)) && f.exists(p(bak))) {
        if (!f.rename(p(bak), p(path)))
          sys.error(s"crash recovery failed: cannot restore $bak to $path")
      }
    }
    recover(sigsPath(store)); recover(hashesPath(store))
    // mergeSchema: hashes files from before the id column and after it can
    // coexist in one store — a single arbitrary footer must not decide
    // whether id exists (silently dropping it would make retention
    // impossible; reading old rows as id=null would silently skip them)
    def read(path: String) = spark.read.option("mergeSchema", "true").parquet(path)
    val drop = dropIds.map(_.select(col(dropIds.get.columns.head).as("__drop_id")))
    if (drop.isDefined) {
      val hashes = read(hashesPath(store))
      require(hashes.columns.contains("id"),
        "store predates id-carrying hashes; retention would half-retire — recreate the store")
      require(hashes.filter(col("id").isNull).isEmpty,
        "store has pre-id hash rows (id=null): retention cannot retire them — " +
          "recreate the store or compact without dropIds first")
    }
    def swapIn(path: String)(rewrite: DataFrame => DataFrame): Unit = {
      val tmp = s"$path.compact-tmp"
      val bak = s"$path.compact-bak"
      f.delete(p(tmp), true); f.delete(p(bak), true)
      rewrite(read(path)).write.parquet(tmp)
      if (!f.rename(p(path), p(bak)))
        sys.error(s"compaction swap failed for $path — store left on the old layout")
      if (!f.rename(p(tmp), p(path))) {
        // roll the backup straight back so the live dir never stays missing
        f.rename(p(bak), p(path))
        sys.error(s"compaction swap failed for $path — old layout restored")
      }
      f.delete(p(bak), true)
    }
    def retire(df: DataFrame): DataFrame = drop match {
      case None => df
      case Some(d) => df.join(d, df("id") === d("__drop_id"), "left_anti")
    }
    swapIn(sigsPath(store))(df =>
      retire(df).distinct().repartition(partitions, col("band"), col("sig")))
    swapIn(hashesPath(store))(df =>
      retire(df).distinct().repartition(partitions, col("text_hash")))
  }
}
