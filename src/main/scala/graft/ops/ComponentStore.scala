package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent connected-component labels for CONTINUOUS KG construction —
  * the entity-resolution sibling of [[EdgeStore]] (edge counts) and
  * [[graft.graph.RankStore]] (authority): each crawl batch contributes new
  * edges, and the store folds them into a (id, cluster) label relation
  * without ever replaying old batches' edges.
  *
  * The fold is exact, not approximate: stored labels are component-min node
  * ids, so re-materializing each stored component as its star
  * (cluster—member edges) and clustering (star ∪ batch edges) yields
  * EXACTLY the components of the union of every edge ever merged —
  * min-label components are history-independent. That invariant is what the
  * kg_components_store oracle pins: unrolled init+ingest == one full-batch
  * recursive-closure recompute.
  *
  * Exactly-once batch merges: identical ledger + write-then-rename swap
  * protocol as [[EdgeStore]] (single-writer; `_batches.txt` rides inside the
  * state dir so data and ledger commit atomically; recovery on every entry).
  *
  * Scale shape: one merge = one [[Dedup.clusters]] run over (star ∪ delta)
  * — the star relation has one row per non-min node (state-sized, not
  * history-sized), clustering is distributed min-label propagation with
  * O(log d) pointer-halving rounds, and the state is rewritten partitioned
  * on the node key. At lakehouse scale this is MERGE INTO on the bucketed
  * node key; the swap emulates snapshot atomicity at directory granularity. */
object ComponentStore {

  private def statePath(store: String) = s"$store/state"
  private val LedgerName = "_batches.txt"

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def p(s: String) = new org.apache.hadoop.fs.Path(s)

  def exists(spark: SparkSession, store: String): Boolean =
    fs(spark, store).exists(p(statePath(store)))

  /** Restore a swap interrupted between the two renames and clear incomplete
    * tmp writes. Idempotent; called on every entry. */
  private def recover(spark: SparkSession, store: String): Unit = {
    val f = fs(spark, store)
    val (live, bak, tmp) =
      (statePath(store), s"${statePath(store)}.merge-bak", s"${statePath(store)}.merge-tmp")
    if (!f.exists(p(live)) && f.exists(p(bak)))
      if (!f.rename(p(bak), p(live)))
        sys.error(s"crash recovery failed: cannot restore $bak to $live")
    f.delete(p(tmp), true)
  }

  /** Batch ids already folded into the state (empty for a fresh store). */
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

  /** The (id, cluster) label relation. Nodes whose only edges were
    * self-loops never enter the state (self-loops carry no connectivity —
    * the [[graft.graph.GraphOps.connectedComponents]] contract). */
  def state(spark: SparkSession, store: String): DataFrame = {
    recover(spark, store)
    require(exists(spark, store), s"no component store at $store")
    spark.read.parquet(statePath(store))
  }

  /** Fold one batch's edges into the store (creating it if absent). `delta`
    * is any (source, target) edge relation — weights and self-loops are
    * ignored; only connectivity folds in. Returns false (and does nothing)
    * when `batchId` is already in the ledger — the idempotent-retry path. */
  def merge(delta: DataFrame, store: String, batchId: String,
      partitions: Int = 32): Boolean = {
    require(batchId.trim.nonEmpty && !batchId.contains("\n"),
      s"batchId must be a non-empty single-line token, got '$batchId'")
    val spark = delta.sparkSession
    val have = mergedBatches(spark, store) // runs crash recovery on entry
    if (have.contains(batchId)) return false
    val pairs = delta.filter(col("source") =!= col("target"))
      .select(least(col("source"), col("target")).as("a_id"),
        greatest(col("source"), col("target")).as("b_id"))
      .distinct()
    val withStar =
      if (exists(spark, store))
        pairs.union(spark.read.parquet(statePath(store))
            .filter(col("id") =!= col("cluster"))
            // cluster is the component MIN, so (cluster, id) is already
            // (least, greatest) ordered
            .select(col("cluster").as("a_id"), col("id").as("b_id")))
          .distinct()
      else pairs
    val merged = Dedup.clusters(withStar)
    val f = fs(spark, store)
    val (live, bak, tmp) =
      (statePath(store), s"${statePath(store)}.merge-bak", s"${statePath(store)}.merge-tmp")
    merged.repartition(partitions, col("id")).write.parquet(tmp)
    writeLedger(spark, tmp, have + batchId)
    if (f.exists(p(live))) {
      f.delete(p(bak), true)
      if (!f.rename(p(live), p(bak)))
        sys.error(s"merge swap failed for $live — store left on the old state")
      if (!f.rename(p(tmp), p(live))) {
        f.rename(p(bak), p(live)) // never leave the live dir missing
        sys.error(s"merge swap failed for $live — old state restored")
      }
      f.delete(p(bak), true)
    } else if (!f.rename(p(tmp), p(live)))
      sys.error(s"initial merge failed: cannot move $tmp to $live")
    true
  }
}
