package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent k-means quantizer state for CONTINUOUS ANN-index maintenance —
  * [[SigStore]]/[[graft.graph.RankStore]]/[[EdgeStore]]'s sibling for the
  * vector tier: the IVF coarse quantizer must accrete with the corpus, but
  * retraining from scratch per batch re-reads everything. The store keeps
  * per-cell per-dimension SUMS and COUNTS (exact BIGINT — unlike means,
  * sums merge exactly and commute), so each ingest is one assignment scan of
  * the NEW batch plus a (cell, pos)-keyed fold; the live centroids are
  * derived at read as floor(sum/cnt) — the same integer mean the exact
  * Lloyd's step uses, so the whole lifecycle stays bit-reproducible
  * cross-engine (the ann_kmeans_store oracle unrolls init + one ingest).
  *
  * Init trains [[Similarity.kmeansCentroids]] on the seed batch and writes
  * its state as the trained centroid itself (ONE virtual point per cell — a
  * deterministic smoothing prior that also keeps every cell defined if its
  * data drains) plus the seed batch's sums under the trained assignment.
  * Ingest assigns each new batch to the CURRENT derived centroids (classic
  * mini-batch k-means step) and folds its sums in — exactly-once per
  * batchId via the [[EdgeStore]] ledger-inside-swapped-dir pattern.
  *
  * SINGLE-WRITER, like the other stores: crash-retry safe, not
  * concurrent-writer safe (the optimistic-commit protocol is what an
  * Iceberg/Delta table would add).
  *
  * Scale shape: state is k×dim rows (tiny); the only corpus-sized work per
  * ingest is the map-side argmin scan of the new batch (native
  * centroid_argmin kernel, centroid matrix as a reference object).
  */
object CentroidStore {

  final case class Params(k: Int, dim: Int, scale: Int)

  private def statePath(store: String) = s"$store/state"
  private val LedgerName = "_batches.txt"
  private val ParamsName = "_params.json"

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def p(s: String) = new org.apache.hadoop.fs.Path(s)

  def exists(spark: SparkSession, store: String): Boolean =
    fs(spark, store).exists(p(statePath(store)))

  private def recover(spark: SparkSession, store: String): Unit = {
    val f = fs(spark, store)
    val (live, bak, tmp) =
      (statePath(store), s"${statePath(store)}.merge-bak", s"${statePath(store)}.merge-tmp")
    if (!f.exists(p(live)) && f.exists(p(bak)))
      if (!f.rename(p(bak), p(live)))
        sys.error(s"crash recovery failed: cannot restore $bak to $live")
    f.delete(p(tmp), true)
  }

  def mergedBatches(spark: SparkSession, store: String): Set[String] = {
    recover(spark, store)
    val f = fs(spark, store)
    val ledger = p(s"${statePath(store)}/$LedgerName")
    if (!f.exists(ledger)) Set.empty
    else {
      val in = f.open(ledger)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      s.split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSet
    }
  }

  private def writeLedger(spark: SparkSession, dir: String, ids: Set[String]): Unit = {
    val out = fs(spark, dir).create(p(s"$dir/$LedgerName"), true)
    try out.write((ids.toSeq.sorted.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def writeParams(spark: SparkSession, dir: String, params: Params): Unit = {
    val out = fs(spark, dir).create(p(s"$dir/$ParamsName"), true)
    try out.write(
      s"""{"k":${params.k},"dim":${params.dim},"scale":${params.scale}}""".getBytes("UTF-8"))
    finally out.close()
  }

  /** Pinned params — a later run with different k/dim/scale fails fast
    * rather than folding incompatible sums. */
  def params(spark: SparkSession, store: String): Params = {
    recover(spark, store)
    val f = fs(spark, store)
    val in = f.open(p(s"${statePath(store)}/$ParamsName"))
    val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    def field(n: String) = s""""$n":(\\d+)""".r.findFirstMatchIn(s).get.group(1).toInt
    Params(field("k"), field("dim"), field("scale"))
  }

  /** The raw (cell, pos, s, cnt) state relation. cnt repeats per pos. */
  def state(spark: SparkSession, store: String): DataFrame = {
    recover(spark, store)
    require(exists(spark, store), s"no centroid store at $store")
    spark.read.parquet(statePath(store))
  }

  /** Live centroids: floor(sum/cnt) per (cell, pos) — k×dim longs. */
  def centroids(spark: SparkSession, store: String): Array[Array[Long]] = {
    val pr = params(spark, store)
    val rows = state(spark, store).collect()
    val cents = Array.fill(pr.k)(Array.fill(pr.dim)(0L))
    rows.foreach { r =>
      val (cell, pos) = (r.getLong(0).toInt, r.getLong(1).toInt)
      cents(cell)(pos) = math.floor(r.getLong(2).toDouble / r.getLong(3)).toLong
    }
    cents
  }

  private def quant(vec: Column, scale: Int): Column =
    transform(vec.cast("array<double>"), x => floor(x * scale).cast("long"))

  /** Per-(cell, pos) sums + counts of `df` under the given centroids. */
  private def sumsUnder(df: DataFrame, id: Column, vec: Column,
      cents: Array[Array[Long]], scale: Int): DataFrame =
    df.select(quant(vec, scale).as("q")) // quantize once, own projection
      .select(graft.functions.VectorExpressions.centroid_argmin(col("q"), cents).as("cell"),
        posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos").cast("long").as("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("cnt"))

  /** Train on the seed batch, write state = virtual-centroid prior + seed
    * sums. Fails if the store already exists. */
  def init(seed: DataFrame, id: Column, vec: Column, store: String,
      params: Params, iters: Int = 2): Unit = {
    val spark = seed.sparkSession
    require(!exists(spark, store), s"centroid store at $store already exists")
    val trained = Similarity.kmeansCentroids(seed, id, vec, params.k, iters, params.scale)
    import spark.implicits._
    val virtual = (for (c <- trained.indices; d <- 0 until params.dim)
      yield (c.toLong, d.toLong, trained(c)(d), 1L)).toDF("cell", "pos", "s", "cnt")
    val seedSums = sumsUnder(seed, id, vec, trained, params.scale)
    val merged = virtual.union(seedSums)
      .groupBy(col("cell"), col("pos"))
      .agg(sum(col("s")).as("s"), sum(col("cnt")).as("cnt"))
    val tmp = s"${statePath(store)}.merge-tmp"
    merged.repartition(1).write.parquet(tmp)
    writeLedger(spark, tmp, Set("init"))
    writeParams(spark, tmp, params)
    if (!fs(spark, store).rename(p(tmp), p(statePath(store))))
      sys.error(s"init failed: cannot move $tmp to ${statePath(store)}")
  }

  /** Fold one batch into the store under the CURRENT derived centroids.
    * Returns false (no-op) when `batchId` is already in the ledger. */
  def ingest(batch: DataFrame, id: Column, vec: Column, store: String,
      batchId: String): Boolean = {
    require(batchId.trim.nonEmpty && !batchId.contains("\n"),
      s"batchId must be a non-empty single-line token, got '$batchId'")
    val spark = batch.sparkSession
    val have = mergedBatches(spark, store)
    if (have.contains(batchId)) return false
    val pr = params(spark, store)
    val cents = centroids(spark, store)
    val delta = sumsUnder(batch, id, vec, cents, pr.scale)
    val merged = state(spark, store).select("cell", "pos", "s", "cnt").union(delta)
      .groupBy(col("cell"), col("pos"))
      .agg(sum(col("s")).as("s"), sum(col("cnt")).as("cnt"))
      .localCheckpoint() // sever from the state files about to be swapped out
    val f = fs(spark, store)
    val live = statePath(store)
    val bak = s"$live.merge-bak"
    val tmp = s"$live.merge-tmp"
    merged.repartition(1).write.parquet(tmp)
    writeLedger(spark, tmp, have + batchId)
    writeParams(spark, tmp, pr)
    f.delete(p(bak), true)
    if (!f.rename(p(live), p(bak)))
      sys.error(s"merge swap failed for $live — store left on the old state")
    if (!f.rename(p(tmp), p(live))) {
      f.rename(p(bak), p(live))
      sys.error(s"merge swap failed for $live — old state restored")
    }
    f.delete(p(bak), true)
    true
  }

  /** Assign a relation to the store's live cells (map-side argmin). */
  def assign(df: DataFrame, id: Column, vec: Column, store: String): DataFrame = {
    val spark = df.sparkSession
    val pr = params(spark, store)
    df.select(id.as("id"), graft.functions.VectorExpressions
      .centroid_argmin(quant(vec, pr.scale), centroids(spark, store)).as("cell"))
  }
}
