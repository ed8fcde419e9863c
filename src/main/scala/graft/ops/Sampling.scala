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

  /** Token-budget mixture sampling — the corpus-mixing step of a training
    * run (Pile/DoReMi shape): each source contributes documents until its
    * token budget `floor(weight_s · totalBudget)` is exhausted, and WHICH
    * documents fill the budget is a deterministic, partition-invariant
    * hash order rather than scan order. The canonical per-source order is
    * (cell, md5(id), id) with cell = [[hashBucket]](id) div (Buckets/cells);
    * a row is kept iff its per-source cumulative token count (inclusive,
    * in that order) is ≤ the source's budget.
    *
    * Scale shape — the naive rule is a running sum over EVERY row of a
    * source through one partition (a skew bomb: one web crawl source can be
    * most of the corpus). Instead, two levels:
    *   1. one map-side agg to a (source × cells) token histogram — tiny;
    *   2. a window over that histogram picks the full-prefix cells (cum ≤
    *      budget) and the single crossing cell per source;
    *   3. the decision broadcast-joins back: full-cell rows pass with no
    *      further work, and only the crossing cell's rows (≈ 1/cells of a
    *      source) pay an exact within-cell running sum.
    * So the per-row cost is one broadcast hash join, and the only windowed
    * relation is bounded by source_tokens/cells per source.
    *
    * Sources absent from `weights` get `defaultWeight`. Rows with null
    * tokens are dropped; zero-token rows follow the two-level decision
    * (they are kept only in the selected cell prefix — at the 100 TB input
    * shape tokens ≥ 1 for any non-empty document). */
  def tokenBudgetMixture(df: DataFrame, id: Column, source: Column,
      tokens: Column, weights: Map[String, Double], totalBudget: Long,
      defaultWeight: Double = 0.0, cells: Int = 1000): DataFrame = {
    require(totalBudget >= 0, s"totalBudget must be >= 0: $totalBudget")
    require(cells >= 1 && Buckets % cells == 0,
      s"cells must divide the $Buckets bucket space: $cells")
    require((defaultWeight +: weights.values.toSeq).forall(_ >= 0),
      "weights must be >= 0")
    val cellWidth = Buckets / cells
    def budgetFor(src: Column): Column = weights.foldLeft(
      lit((defaultWeight * totalBudget).toLong)) { case (acc, (value, w)) =>
        when(src === value, lit((w * totalBudget).toLong)).otherwise(acc)
    }
    val inputCols = df.columns.map(col)
    val base = df
      .withColumn("__id", id).withColumn("__src", source)
      .withColumn("__tok", tokens.cast("long"))
      .withColumn("__h", md5(col("__id").cast("string").cast("binary")))
      // cell label = the cell's bucket-start offset (bucket − bucket mod
      // width): integer-only, exact, and order-identical to bucket div width
      .withColumn("__cell",
        hashBucket(col("__id")) - pmod(hashBucket(col("__id")), lit(cellWidth)))
    val hist = base.groupBy(col("__src"), col("__cell"))
      .agg(sum(col("__tok")).as("__ctok"))
    val wCells = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__src")).orderBy(col("__cell"))
    val decision = hist
      .withColumn("__cum", sum(col("__ctok")).over(wCells))
      .withColumn("__before", col("__cum") - col("__ctok"))
      .withColumn("__budget", budgetFor(col("__src")))
      .filter(col("__cum") <= col("__budget") || col("__before") < col("__budget"))
      .select(col("__src").as("__dsrc"), col("__cell").as("__dcell"),
        (col("__cum") <= col("__budget")).as("__full"),
        col("__before"), col("__budget"))
    val joined = base.join(broadcast(decision),
      col("__src") === col("__dsrc") && col("__cell") === col("__dcell"))
    val wInCell = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__src")).orderBy(col("__h"), col("__id"))
    val kept = joined.filter(col("__full")).select(inputCols: _*)
      .union(joined.filter(!col("__full"))
        .withColumn("__rcum", sum(col("__tok")).over(wInCell))
        .filter(col("__before") + col("__rcum") <= col("__budget"))
        .select(inputCols: _*))
    kept
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
