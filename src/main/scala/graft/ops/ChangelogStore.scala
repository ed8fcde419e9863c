package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent add/retract changelog for a CONTINUOUSLY-versioned KG — the
  * durable substrate under [[Changelog]]: each crawl/ingest batch appends
  * its (s, p, o, ts, op) entries, consumers read any point-in-time snapshot
  * or diff ([[Changelog.asOfSnapshot]] / [[Changelog.asOfDelta]] over the
  * stored relation), and [[compact]] keeps the store
  * O(live keys + recent history) instead of O(all history) — the retention
  * story a 10^12-triple KG needs when every crawl retracts and re-asserts.
  * Sibling of [[SigStore]] / [[EdgeStore]] / [[ComponentStore]] in the
  * continuous-ingest family, with the family's exactly-once contract:
  *
  * Exactly-once batch merges: the merged-batch ledger (`_batches.txt`)
  * rides INSIDE the state directory and the directory is replaced by a
  * write-then-rename swap, so data and ledger commit atomically. A crash
  * before the swap leaves old state + old ledger (retry re-merges); after
  * it, new state + new ledger (retry is a no-op). SINGLE-WRITER, like the
  * siblings: serialize merges per store; at lakehouse scale this is the
  * optimistic-commit protocol an Iceberg/Delta table provides.
  *
  * Scale shape: a merge unions the batch under the existing partitioning —
  * one write of state+batch, repartitioned on the triple key so snapshot
  * aggregations and subsequent merges stay co-partitioned; compaction is
  * [[Changelog.compact]]'s single aggregation materialized through the same
  * swap. Entries are never rewritten per batch — history accumulates
  * append-only between compactions, exactly like a log-structured table.
  */
object ChangelogStore {

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

  /** The stored (s, p, o, ts, op) changelog relation. */
  def log(spark: SparkSession, store: String): DataFrame = {
    recover(spark, store)
    require(exists(spark, store), s"no changelog store at $store")
    spark.read.parquet(statePath(store))
  }

  /** The KG state at time `t` from the stored log. */
  def snapshot(spark: SparkSession, store: String, t: Long): DataFrame =
    Changelog.asOfSnapshot(log(spark, store), t)

  /** Triples added/removed between the two cuts, from the stored log. */
  def delta(spark: SparkSession, store: String, t1: Long, t2: Long): DataFrame =
    Changelog.asOfDelta(log(spark, store), t1, t2)

  private def swapIn(spark: SparkSession, store: String, df: DataFrame,
      ids: Set[String], partitions: Int): Unit = {
    val f = fs(spark, store)
    val (live, bak, tmp) =
      (statePath(store), s"${statePath(store)}.merge-bak", s"${statePath(store)}.merge-tmp")
    df.repartition(partitions, col("s"), col("p"), col("o")).write.parquet(tmp)
    writeLedger(spark, tmp, ids)
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
  }

  /** Append one batch's entries (s, p, o, ts: long, op: 'add'|'del') to the
    * store, creating it if absent. Returns false (no-op) when `batchId` is
    * already in the ledger — the idempotent-retry path. */
  def merge(entries: DataFrame, store: String, batchId: String,
      partitions: Int = 32): Boolean = {
    require(batchId.trim.nonEmpty && !batchId.contains("\n"),
      s"batchId must be a non-empty single-line token, got '$batchId'")
    val spark = entries.sparkSession
    val have = mergedBatches(spark, store) // runs crash recovery on entry
    if (have.contains(batchId)) return false
    val norm = entries.select(col("s").cast("string"), col("p").cast("string"),
      col("o").cast("string"), col("ts").cast("long"), col("op").cast("string"))
    val merged =
      if (exists(spark, store))
        spark.read.parquet(statePath(store)).unionByName(norm)
      else norm
    swapIn(spark, store, merged, have + batchId, partitions)
    true
  }

  /** Collapse the history at-or-before `cut` to per-key winners
    * ([[Changelog.compact]] semantics — post-cut snapshots and late-
    * straggler tie-breaks are preserved exactly), materialized through the
    * same atomic swap. The ledger carries over: a re-driven pre-compaction
    * batch remains a no-op afterwards. */
  def compact(spark: SparkSession, store: String, cut: Long,
      partitions: Int = 32): Unit = {
    val have = mergedBatches(spark, store)
    require(exists(spark, store), s"no changelog store at $store")
    // the compaction plan reads the live directory and writes to the tmp
    // path; the live->bak rename happens only after that write completes,
    // so no checkpoint is needed (same ordering as merge)
    val compacted = Changelog.compact(spark.read.parquet(statePath(store)), cut)
    swapIn(spark, store, compacted, have, partitions)
  }
}
