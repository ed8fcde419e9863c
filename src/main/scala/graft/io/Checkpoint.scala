package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Resumable stage execution with per-partition lineage — the engine feature
  * behind the north_rule "resumable from checkpoint with per-partition lineage
  * + metrics" requirement. The reference's primitive form of this is the
  * sqlite `skip_existed` insert-if-absent / `write_missed` path
  * (arelight/data/writers/sqlite_native.py:89-94,
  * arelight/predict/writer_sqlite3.py:22-31); the engine lifts it to bucket
  * granularity so resume needs no per-row existence probes at 10^12 rows.
  *
  * Layout under `path`:
  *   data/     parquet, partitioned by graft_bucket = pmod(xxhash64(url), n)
  *   _lineage/ parquet (bucket, rows, wall_ms) — one row per COMPLETED bucket
  *
  * Exactly-once per bucket: data is written with dynamic partition overwrite,
  * so re-processing a bucket (e.g. after a crash between the data write and
  * the lineage append) REPLACES its partition instead of duplicating rows.
  * The transform must be deterministic per url — which the whole engine is by
  * construction (deterministic ids, SURVEY.md §4.3).
  */
object Checkpoint {

  val BucketCol = "graft_bucket"

  def bucketOf(url: Column, nBuckets: Int): Column = pmod(xxhash64(url), lit(nBuckets))

  final case class ResumeReport(processedBuckets: Seq[Long], skippedBuckets: Long, rowsWritten: Long) {
    def isComplete: Boolean = processedBuckets.isEmpty
  }

  private def lineagePath(path: String) = s"$path/_lineage"
  private def dataPath(path: String) = s"$path/data"

  /** Buckets already recorded as complete. */
  def completedBuckets(spark: SparkSession, path: String): Set[Long] =
    try {
      spark.read.parquet(lineagePath(path)).select("bucket")
        .collect().map(_.getLong(0)).toSet
    } catch { case _: Exception => Set.empty } // no lineage yet

  /** Per-bucket lineage/metrics table (bucket, rows, wall_ms). */
  def lineage(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(lineagePath(path))

  /** The stage's (complete or partial) output. */
  def result(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(dataPath(path))

  /** Run `transform` over the buckets of `input` not yet recorded in lineage,
    * writing outputs partitioned by bucket and appending lineage rows.
    *
    * @param input       any relation carrying `urlCol`
    * @param urlCol      document-identity column; drives bucketing on BOTH the
    *                    input filter and the output partitioning (the transform
    *                    must preserve it under name `outUrlCol`)
    * @param maxBuckets  process at most this many pending buckets this run
    *                    (incremental operation / bounded-failure-domain knob)
    */
  def runResumable(
      input: DataFrame,
      urlCol: String,
      outUrlCol: String,
      nBuckets: Int,
      path: String,
      maxBuckets: Int = Int.MaxValue)(
      transform: DataFrame => DataFrame)(implicit spark: SparkSession): ResumeReport = {

    val done = completedBuckets(spark, path)
    val pendingAll = (0L until nBuckets.toLong).filterNot(done)
    val pending = pendingAll.take(maxBuckets)
    if (pending.isEmpty) return ResumeReport(Seq.empty, done.size.toLong, 0L)

    val t0 = System.nanoTime()
    val inBucketed = input.withColumn(BucketCol, bucketOf(col(urlCol), nBuckets))
    val selected =
      if (pending.size == nBuckets) inBucketed
      else inBucketed.filter(col(BucketCol).isin(pending: _*))

    val out = transform(selected.drop(BucketCol))
      .withColumn(BucketCol, bucketOf(col(outUrlCol), nBuckets))

    out.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(BucketCol)
      .parquet(dataPath(path))
    val wallMs = (System.nanoTime() - t0) / 1000000L

    // lineage: one row per bucket actually processed this run (buckets whose
    // input was empty still complete — recorded with rows=0)
    import spark.implicits._
    // partition-dir column comes back type-inferred (int) — normalize to long
    val counts = spark.read.parquet(dataPath(path))
      .withColumn(BucketCol, col(BucketCol).cast("long"))
      .filter(col(BucketCol).isin(pending: _*))
      .groupBy(col(BucketCol).as("bucket")).agg(count(lit(1)).as("rows"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lineageRows = pending.map(b => (b, counts.getOrElse(b, 0L), wallMs))
    val rowsWritten = lineageRows.map(_._2).sum
    lineageRows.toDF("bucket", "rows", "wall_ms")
      .repartition(1).write.mode("append").parquet(lineagePath(path))

    ResumeReport(pending, done.size.toLong, rowsWritten)
  }
}
