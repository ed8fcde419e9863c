package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixture construction.
  *
  * `df.sample()` is rng-per-partition: the selected set changes with
  * partitioning, retries, and Spark versions — unacceptable for reproducible
  * corpus curation (re-running the pipeline must select the SAME documents,
  * and an incremental re-run over late-arriving data must make the same
  * per-row decisions it made last time). Hash-mod sampling fixes both: the
  * keep/drop decision is a pure function of the row's id, evaluated map-side
  * with no shuffle, no rng state, and no driver coordination — at 100 TB the
  * sample is one codegen'd filter pushed against the scan.
  *
  * Hash: md5 of the id's decimal string (cross-engine: DuckDB computes the
  * identical bucket, so the sample is oracle-checkable), top 60 bits, mod
  * [[Sampling.Buckets]]. Fractions are resolved to integer bucket thresholds
  * (floor), so f=0.5 keeps buckets [0, 500000) exactly.
  */
object Sampling {

  /** Bucket-space resolution: fractions are exact to 1e-6. */
  val Buckets = 1000000L

  /** Deterministic bucket in [0, Buckets) from any id column. */
  def hashBucket(id: Column, buckets: Long = Buckets): Column =
    conv(substring(md5(id.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long") % buckets

  /** Keep a deterministic `fraction` of rows, decided per id. */
  def sampleByHash(df: DataFrame, id: Column, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of [0,1]: $fraction")
    df.filter(hashBucket(id) < lit((fraction * Buckets).toLong))
  }

  /** Stratified deterministic sampling: per-stratum keep fractions (e.g.
    * language balancing: en 0.5, de 0.25, everything else `default`). One
    * map-side filter; the threshold is a when-chain on the stratum column, so
    * adding strata never adds passes or shuffles. */
  def stratifiedSample(df: DataFrame, id: Column, stratum: Column,
      fractions: Map[String, Double], default: Double = 0.0): DataFrame = {
    require((default +: fractions.values.toSeq).forall(f => f >= 0 && f <= 1),
      "fractions out of [0,1]")
    val threshold = fractions.foldLeft(lit((default * Buckets).toLong)) {
      case (acc, (value, f)) => when(stratum === value, lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(id) < threshold)
  }

  /** Importance-weighted deterministic sampling: keep each row with
    * per-row probability `weight` (a column in [0,1], e.g. a quality score),
    * decided as `hashBucket(id) < floor(weight * Buckets)` — the same
    * map-side, rng-free, partition-invariant decision as [[sampleByHash]],
    * but with a data-dependent threshold. Weights outside [0,1] clamp; a NaN
    * weight (e.g. a 0/0 quality ratio) clamps to 0 — Spark orders NaN ABOVE
    * all doubles, so without the nanvl a failed score would silently be kept
    * with probability 1, over-representing exactly the rows whose scoring
    * broke. Null weights drop (null threshold -> filter false).
    * Cross-engine exactness: floor(weight * 10^6) is one IEEE multiply +
    * floor, bit-identical in any engine computing the weight expression the
    * same way — the oracle mirrors the expression, not a rounded constant. */
  def weightedSample(df: DataFrame, id: Column, weight: Column): DataFrame = {
    val threshold = floor(
      least(lit(1.0), greatest(lit(0.0), nanvl(weight.cast("double"), lit(0.0)))) *
        lit(Buckets.toDouble)
    ).cast("long")
    df.filter(hashBucket(id) < threshold)
  }

  /** Keep at most `cap` rows per group, decided by a deterministic md5 rank
    * within the group (ties by id) — a partition-invariant, unbiased
    * hash-sample of each group rather than a scan-order artifact. Groups at
    * or under the cap pass through whole; all input columns are preserved.
    * One exchange on the group key ([[graft.ops.UrlOps.hostCap]] is the
    * per-host instance; Curate's `--source-cap` is the per-source one). */
  def groupCap(df: DataFrame, group: Column, id: Column, cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1: $cap")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__grp"))
      .orderBy(md5(col("__gid").cast("string")), col("__gid"))
    df.withColumn("__grp", group).withColumn("__gid", id)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap)
      .drop("__grp", "__gid", "__rk")
  }
}
