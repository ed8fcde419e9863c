package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.DataFrame

class ChangelogStoreSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-clogstore").toString

  private def entries(rows: (String, Long, String)*): DataFrame =
    rows.map { case (s, ts, op) => (s, "r", "x", ts, op) }
      .toDF("s", "p", "o", "ts", "op")

  private def live(store: String, t: Long): Set[String] =
    ChangelogStore.snapshot(spark, store, t).collect().map(_.getString(0)).toSet

  test("batch merges accumulate; snapshots read any point in time") {
    val store = tmp()
    assert(ChangelogStore.merge(entries(("a", 10L, "add"), ("b", 10L, "add")), store, "b1"))
    assert(ChangelogStore.merge(entries(("a", 20L, "del"), ("c", 20L, "add")), store, "b2"))
    assert(live(store, 10L) == Set("a", "b"))
    assert(live(store, 20L) == Set("b", "c"))
    val d = ChangelogStore.delta(spark, store, 10L, 20L).collect()
      .map(r => (r.getString(0), r.getString(3))).toSet
    assert(d == Set(("a", "removed"), ("c", "added")))
  }

  test("idempotent retry: a re-driven batchId is a no-op") {
    val store = tmp()
    assert(ChangelogStore.merge(entries(("a", 10L, "add")), store, "b1"))
    assert(!ChangelogStore.merge(entries(("a", 99L, "del")), store, "b1"))
    assert(live(store, 100L) == Set("a")) // the retry's rows never landed
    assert(ChangelogStore.mergedBatches(spark, store) == Set("b1"))
  }

  test("compact shrinks history, preserves post-cut snapshots and the ledger") {
    val store = tmp()
    ChangelogStore.merge(entries(
      ("a", 1L, "add"), ("a", 2L, "del"), ("a", 3L, "add"),
      ("b", 2L, "add"), ("b", 4L, "del")), store, "b1")
    ChangelogStore.merge(entries(("c", 50L, "add")), store, "b2")
    val before = ChangelogStore.log(spark, store).count()
    ChangelogStore.compact(spark, store, 10L)
    val after = ChangelogStore.log(spark, store).count()
    assert(before == 6L && after == 3L) // a,b winners + c's post-cut entry
    assert(live(store, 10L) == Set("a"))
    assert(live(store, 60L) == Set("a", "c"))
    // ledger survives compaction: the old batch is still a no-op
    assert(!ChangelogStore.merge(entries(("z", 99L, "add")), store, "b1"))
  }

  test("crash between the two swap renames recovers on next entry") {
    val store = tmp()
    ChangelogStore.merge(entries(("a", 10L, "add")), store, "b1")
    // simulate: live renamed away to .merge-bak, crash before tmp->live
    val st = java.nio.file.Paths.get(s"$store/state")
    val bak = java.nio.file.Paths.get(s"$store/state.merge-bak")
    java.nio.file.Files.move(st, bak)
    assert(live(store, 10L) == Set("a")) // recover() restored from bak
    assert(ChangelogStore.mergedBatches(spark, store) == Set("b1"))
  }
}
