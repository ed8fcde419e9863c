package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators (engine extension; no reference counterpart — the
  * reference is a single-box batch tool, but a 100 TB table's FILE LAYOUT is
  * a first-class operator: it decides how many files a selective scan can
  * skip before a single row is read).
  *
  * Z-ordering (Morton curve) interleaves the bits of several clustering
  * columns so that range-partitioning by the single z-value keeps rows close
  * in EVERY dimension close in file space — the technique behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`. Each written file then covers a small
  * bounding box in all clustered dimensions, and min/max file statistics
  * (parquet footers, Iceberg manifests) prune multi-dimensional predicates
  * that a single-column sort could only prune in its leading column.
  *
  * Everything here is exact BIGINT bit arithmetic on masked non-negative
  * inputs — codegen-friendly built-ins (shifts, AND, +), no UDF, no HOF —
  * so z-values are bit-identical cross-engine and the layout_zorder oracle
  * hash-matches.
  */
object Layout {

  /** Morton z-value: interleave the low `bits` bits of each column —
    * column i owns bit positions b·n + i for b in [0, bits). Inputs are
    * masked to `bits` bits (values beyond the mask wrap — callers pick
    * `bits` to cover their domain, or pre-bucket). n·bits must be ≤ 63. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1 && bits >= 1 && n * bits <= 63,
      s"zValue needs 1+ columns and n*bits <= 63 (got n=$n bits=$bits)")
    val mask = (1L << bits) - 1
    val terms = for {
      (c, i) <- cols.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long").bitwiseAND(lit(mask)), b).bitwiseAND(lit(1L)),
      b * n + i)
    terms.reduce(_ + _)
  }

  /** Coarse z-bucket: the top log2(buckets) bits of the z-value — the
    * range-partitioning key. `buckets` must be a power of two. */
  def zBucket(z: Column, nCols: Int, bits: Int, buckets: Int): Column = {
    require(buckets >= 1 && Integer.bitCount(buckets) == 1, s"buckets=$buckets not a power of 2")
    val shift = nCols * bits - Integer.numberOfTrailingZeros(buckets)
    require(shift >= 0, s"buckets=$buckets exceeds the z-value space")
    shiftright(z, shift)
  }

  /** Write `df` z-ordered: range-partition on the z-value of `cols`, sort
    * within partitions, drop the helper column, write parquet. Each output
    * file covers one z-range = a small bounding box in every clustered
    * dimension (LayoutSpec asserts the multi-dimensional pruning win vs a
    * single-column sort). One shuffle — the same cost as any repartition —
    * paid once at write time, amortized over every selective read after. */
  def writeZordered(df: DataFrame, path: String, cols: Seq[String], bits: Int,
      partitions: Int): Unit =
    df.withColumn("_z", zValue(cols.map(col), bits))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
