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
  * continuous-ingest family, with the family's exactly-once contract.
  *
  * TRUE append-only merges (log-structured): each batch lands as its own
  * sub-directory `state/d-<md5(batchId)>/` holding the batch's parquet plus
  * an `_batches.txt` marker with the batch id, written OUTSIDE the state
  * directory and committed by one atomic rename — so per-merge I/O is
  * O(batch), never O(history), and [[StreamOps.changelogIngestStream]]'s
  * per-micro-batch merges stay linear cumulative. The merged-batch ledger
  * is DERIVED (union of the per-directory markers): a directory exists iff
  * its marker does, so there is no global file to rewrite per merge and no
  * torn-ledger crash window. A crash before the rename leaves a stray
  * `.batch-tmp-*` directory that [[recover]] clears; after it, the batch is
  * fully committed and a retry is a no-op. SINGLE-WRITER, like the
  * siblings: serialize merges per store; at lakehouse scale this is the
  * optimistic-commit protocol an Iceberg/Delta table provides.
  *
  * Only [[compact]] rewrites: it collapses all batch directories into one
  * `d-base` directory (whose marker carries ALL absorbed batch ids, so a
  * re-driven pre-compaction batch remains a no-op) through the
  * write-then-rename swap of the whole state directory.
  *
  * Scale shape: each batch is repartitioned on the triple key at write, so
  * snapshot aggregations over the union read stay hash-bucketed per file
  * group; compaction is [[Changelog.compact]]'s single aggregation.
  */
object ChangelogStore {

  private def statePath(store: String) = s"$store/state"
  private val LedgerName = "_batches.txt"

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def p(s: String) = new org.apache.hadoop.fs.Path(s)

  private def dirFor(batchId: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(batchId.getBytes("UTF-8"))
    "d-" + md.map("%02x".format(_)).mkString.take(16)
  }

  def exists(spark: SparkSession, store: String): Boolean =
    fs(spark, store).exists(p(statePath(store)))

  /** Restore a compaction swap interrupted between the two renames;
    * additionally clear incomplete tmp writes (the compaction tmp and stray
    * batch tmps) when entered from a WRITE path. Read paths (log/snapshot/
    * mergedBatches) must stay side-effect-free beyond the swap restore: a
    * reader running concurrently with an in-flight merge would otherwise
    * delete the writer's uncommitted tmp dir and fail its commit rename —
    * the SINGLE-WRITER contract covers merges, not readers. Idempotent. */
  private def recover(spark: SparkSession, store: String,
      clearTmps: Boolean = false): Unit = {
    val f = fs(spark, store)
    val (live, bak, tmp) =
      (statePath(store), s"${statePath(store)}.merge-bak", s"${statePath(store)}.merge-tmp")
    if (!f.exists(p(live)) && f.exists(p(bak)))
      if (!f.rename(p(bak), p(live)))
        sys.error(s"crash recovery failed: cannot restore $bak to $live")
    if (clearTmps) {
      f.delete(p(tmp), true)
      if (f.exists(p(store)))
        f.listStatus(p(store)).foreach { st =>
          if (st.getPath.getName.startsWith(".batch-tmp-")) f.delete(st.getPath, true)
        }
    }
  }

  /** The committed batch directories (full paths), i.e. every `state/d-*`. */
  private def batchDirs(spark: SparkSession, store: String): Seq[String] = {
    val f = fs(spark, store)
    if (!exists(spark, store)) Seq.empty
    else f.listStatus(p(statePath(store))).toIndexedSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("d-"))
      .map(_.getPath.toString).sorted
  }

  /** Batch ids already folded into the state (empty for a fresh store) —
    * the union of the per-directory commit markers. */
  def mergedBatches(spark: SparkSession, store: String): Set[String] = {
    recover(spark, store)
    val f = fs(spark, store)
    batchDirs(spark, store).iterator.flatMap { d =>
      val marker = p(s"$d/$LedgerName")
      if (!f.exists(marker)) Iterator.empty
      else {
        val in = f.open(marker)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        s.split("\n").iterator.map(_.trim).filter(_.nonEmpty)
      }
    }.toSet
  }

  private def writeLedger(spark: SparkSession, dir: String, ids: Set[String]): Unit = {
    val out = fs(spark, dir).create(p(s"$dir/$LedgerName"), true)
    try out.write((ids.toSeq.sorted.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** The stored (s, p, o, ts, op) changelog relation — the union read over
    * the base + batch directories (each fully committed by construction). */
  def log(spark: SparkSession, store: String): DataFrame = {
    recover(spark, store)
    require(exists(spark, store), s"no changelog store at $store")
    val dirs = batchDirs(spark, store)
    require(dirs.nonEmpty, s"changelog store at $store has no committed batches")
    spark.read.parquet(dirs: _*)
      .select("s", "p", "o", "ts", "op") // drop any partition-inferred cols
  }

  /** The KG state at time `t` from the stored log. */
  def snapshot(spark: SparkSession, store: String, t: Long): DataFrame =
    Changelog.asOfSnapshot(log(spark, store), t)

  /** Triples added/removed between the two cuts, from the stored log. */
  def delta(spark: SparkSession, store: String, t1: Long, t2: Long): DataFrame =
    Changelog.asOfDelta(log(spark, store), t1, t2)

  /** Append one batch's entries (s, p, o, ts: long, op: 'add'|'del') to the
    * store, creating it if absent. O(batch) I/O — the existing state is
    * neither read nor rewritten. Returns false (no-op) when `batchId` is
    * already committed — the idempotent-retry path. */
  def merge(entries: DataFrame, store: String, batchId: String,
      partitions: Int = 32): Boolean = {
    require(batchId.trim.nonEmpty && !batchId.contains("\n"),
      s"batchId must be a non-empty single-line token, got '$batchId'")
    val spark = entries.sparkSession
    recover(spark, store, clearTmps = true) // write entry: clear stale tmps
    val have = mergedBatches(spark, store)
    if (have.contains(batchId)) return false
    val f = fs(spark, store)
    val norm = entries.select(col("s").cast("string"), col("p").cast("string"),
      col("o").cast("string"), col("ts").cast("long"), col("op").cast("string"))
    val dname = dirFor(batchId)
    val tmp = s"$store/.batch-tmp-$dname"
    norm.repartition(partitions, col("s"), col("p"), col("o")).write.parquet(tmp)
    writeLedger(spark, tmp, Set(batchId))
    if (!f.exists(p(statePath(store)))) f.mkdirs(p(statePath(store)))
    val dest = s"${statePath(store)}/$dname"
    if (!f.rename(p(tmp), p(dest)))
      sys.error(s"batch commit failed: cannot move $tmp to $dest")
    true
  }

  /** Compaction swap: replace the whole state directory with one holding a
    * single `d-base` batch directory (data + the full absorbed-id marker). */
  private def swapIn(spark: SparkSession, store: String, df: DataFrame,
      ids: Set[String], partitions: Int): Unit = {
    val f = fs(spark, store)
    val (live, bak, tmp) =
      (statePath(store), s"${statePath(store)}.merge-bak", s"${statePath(store)}.merge-tmp")
    val baseDir = s"$tmp/d-base"
    df.repartition(partitions, col("s"), col("p"), col("o")).write.parquet(baseDir)
    writeLedger(spark, baseDir, ids)
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

  /** Collapse the history at-or-before `cut` to per-key winners
    * ([[Changelog.compact]] semantics — post-cut snapshots and late-
    * straggler tie-breaks are preserved exactly), materialized through the
    * same atomic swap. The absorbed batch ids carry over into the base
    * marker: a re-driven pre-compaction batch remains a no-op afterwards. */
  def compact(spark: SparkSession, store: String, cut: Long,
      partitions: Int = 32): Unit = {
    recover(spark, store, clearTmps = true) // write entry: clear stale tmps
    val have = mergedBatches(spark, store)
    require(exists(spark, store), s"no changelog store at $store")
    // the compaction plan reads the live batch dirs and writes to the tmp
    // path; the live->bak rename happens only after that write completes,
    // so no checkpoint is needed (same ordering as merge)
    val compacted = Changelog.compact(log(spark, store), cut)
    swapIn(spark, store, compacted, have, partitions)
  }
}
