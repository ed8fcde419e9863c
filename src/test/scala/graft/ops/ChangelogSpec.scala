package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** KG versioning: as-of snapshots and diffs over an add/retract changelog. */
class ChangelogSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // t1: (a) added@10. t2: (a) retracted@20, (b) added@20, (c) add+del tie@30
  private def log = Seq(
    ("a", "r", "x", 10L, "add"),
    ("a", "r", "x", 20L, "del"),
    ("b", "r", "y", 20L, "add"),
    ("c", "r", "z", 30L, "add"),
    ("c", "r", "z", 30L, "del"),
    ("d", "r", "w", 99L, "add") // beyond every cut
  ).toDF("s", "p", "o", "ts", "op")

  private def snap(t: Long): Set[String] =
    Changelog.asOfSnapshot(log, t).collect().map(_.getString(0)).toSet

  test("asOfSnapshot: latest op at-or-before the cut wins") {
    assert(snap(15L) == Set("a"))
    assert(snap(20L) == Set("b")) // a retracted exactly at the cut
    assert(snap(25L) == Set("b"))
  }

  test("asOfSnapshot: a same-ts add/del tie resolves to retraction") {
    assert(snap(30L) == Set("b")) // c's tie at 30 -> del wins
  }

  test("asOfSnapshot: entries after the cut are invisible") {
    assert(!snap(50L).contains("d"))
    assert(snap(100L).contains("d"))
  }

  test("asOfDelta reports added and removed keys between the cuts") {
    val got = Changelog.asOfDelta(log, 15L, 25L)
      .collect().map(r => (r.getString(0), r.getString(3))).toSet
    assert(got == Set(("a", "removed"), ("b", "added")))
  }

  test("asOfDelta: keys live at both cuts or neither are absent") {
    val got = Changelog.asOfDelta(log, 12L, 14L).collect()
    assert(got.isEmpty) // a is live at both, nothing else changed
  }

  test("asOfStates: the fused one-pass read == asOfSnapshot + asOfDelta") {
    for ((t1, t2) <- Seq((15L, 25L), (10L, 30L), (20L, 99L))) {
      val st = Changelog.asOfStates(log, t1, t2).collect()
        .map(r => r.getString(0) -> (r.getBoolean(3), r.getBoolean(4))).toMap
      assert(st.keySet.filter(st(_)._1) == snap(t1), s"snapshot@$t1 diverges")
      val delta = Changelog.asOfDelta(log, t1, t2).collect()
        .map(r => r.getString(0) -> r.getString(3)).toMap
      val added = st.keySet.filter(k => st(k)._2 && !st(k)._1)
      val removed = st.keySet.filter(k => st(k)._1 && !st(k)._2)
      assert(added == delta.keySet.filter(delta(_) == "added"), s"added@$t1-$t2")
      assert(removed == delta.keySet.filter(delta(_) == "removed"), s"removed@$t1-$t2")
    }
  }

  test("asOfDelta rejects a non-increasing cut pair") {
    val ex = intercept[IllegalArgumentException] {
      Changelog.asOfDelta(log, 20L, 20L)
    }
    assert(ex.getMessage.contains("t1 < t2"))
  }

  test("factIntervals: open/closed intervals, re-assertions absorbed, tie pairs dropped") {
    val lg = Seq(
      ("a", "r", "x", 1L, "add"), ("a", "r", "x", 3L, "add"), // re-assert absorbed
      ("a", "r", "x", 5L, "del"),
      ("a", "r", "x", 9L, "add"),                             // reopens
      ("b", "r", "y", 2L, "add"),                             // stays open
      ("c", "r", "z", 4L, "add"), ("c", "r", "z", 4L, "del"), // tie: never live
      ("d", "r", "w", 1L, "del")                              // del-first: nothing
    ).toDF("s", "p", "o", "ts", "op")
    val got = Changelog.factIntervals(lg).collect()
      .map(r => (r.getString(0), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
    assert(got == Set(("a", 1L, Some(5L)), ("a", 9L, None), ("b", 2L, None)))
  }

  test("factIntervals agrees with asOfSnapshot at every instant") {
    val lg = log
    val intervals = Changelog.factIntervals(lg).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getLong(3),
        if (r.isNullAt(4)) Long.MaxValue else r.getLong(4)))
    for (t <- 0L to 100L by 5L) {
      val viaIntervals = intervals.collect {
        case (k, from, until) if from <= t && t < until => k }.toSet
      val viaSnapshot = Changelog.asOfSnapshot(lg, t).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      assert(viaIntervals == viaSnapshot, s"diverged at t=$t")
    }
  }

  test("snapshotSeries: live counts per cut, zero-filled") {
    val got = Changelog.snapshotSeries(log, Seq(0L, 15L, 25L, 100L)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(0L -> 0L, 15L -> 1L, 25L -> 1L, 100L -> 2L))
  }

  test("compact: one winner row per pre-cut key; post-cut snapshots identical") {
    val compacted = Changelog.compact(log, 30L)
    // keys a, b, c collapse to one row each; d's post-cut entry passes through
    assert(compacted.count() == 4L)
    for (t <- Seq(30L, 50L, 99L, 100L)) {
      val a = Changelog.asOfSnapshot(log, t).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      val b = Changelog.asOfSnapshot(compacted, t).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      assert(a == b, s"snapshot diverged at cut $t")
    }
    // the 'del' winner survives compaction: a late pre-cut 'add' straggler
    // must NOT resurrect a retracted key
    val straggler = Seq(("c", "r", "z", 29L, "add")).toDF("s", "p", "o", "ts", "op")
    val got = Changelog.asOfSnapshot(compacted.unionByName(straggler), 50L)
      .collect().map(_.getString(0)).toSet
    assert(!got.contains("c"))
  }

  test("randomized log: snapshot + delta agree with a driver-side replay at every cut") {
    val rnd = new scala.util.Random(42)
    val entries = (1 to 300).map { _ =>
      (s"n${rnd.nextInt(20)}", "r", s"m${rnd.nextInt(5)}",
        rnd.nextInt(50).toLong, if (rnd.nextBoolean()) "add" else "del")
    }
    val df = entries.toDF("s", "p", "o", "ts", "op")
    def replay(t: Long): Set[(String, String, String)] =
      entries.filter(_._4 <= t)
        .groupBy(e => (e._1, e._2, e._3))
        .collect { case (k, es)
            if es.maxBy(e => (e._4, e._5))._5 == "add" => k }
        .toSet
    for (t <- Seq(0L, 10L, 25L, 49L)) {
      val got = Changelog.asOfSnapshot(df, t).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      assert(got == replay(t), s"snapshot mismatch at cut $t")
    }
    val delta = Changelog.asOfDelta(df, 10L, 25L).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getString(3))).toMap
    val (l1, l2) = (replay(10L), replay(25L))
    assert(delta == ((l2 -- l1).map(_ -> "added") ++ (l1 -- l2).map(_ -> "removed")).toMap)
  }

  test("snapshot equals replaying the log manually") {
    val t = 25L
    val want = log.collect()
      .filter(_.getLong(3) <= t)
      .groupBy(r => (r.getString(0), r.getString(1), r.getString(2)))
      .collect { case (k, rs)
          if rs.maxBy(r => (r.getLong(3), r.getString(4))).getString(4) == "add" => k }
      .toSet
    val got = Changelog.asOfSnapshot(log, t).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == want)
  }
}
