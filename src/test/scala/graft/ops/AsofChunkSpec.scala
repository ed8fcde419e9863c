package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** as-of join semantics (latest right at-or-before each left row) and
  * sliding-window chunk arithmetic. */
class AsofChunkSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("asofJoin: latest <= match per key; pre-history rows keep nulls; ties take the right row") {
    val left = Seq( // (user, t, event)
      (1L, 10L, 100L), (1L, 25L, 101L), (1L, 5L, 102L),
      (2L, 50L, 200L), (3L, 7L, 300L))
      .toDF("user_id", "t", "event_id")
    val right = Seq(
      (1L, 8L, 900L), (1L, 20L, 901L), (1L, 25L, 902L), // 902 exactly at left t=25
      (2L, 60L, 950L)) // only AFTER user 2's left row
      .toDF("user_id", "t", "event_id")
    val got = Relational.asofJoin(left, right, "user_id", "t",
        Seq("event_id"), Seq("event_id"))
      .collect().map(r => r.getLong(2) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got == Map(
      100L -> 900L,  // t=10: latest right at 8
      101L -> 902L,  // t=25: the equal-time right row wins (<= semantics)
      102L -> -1L,   // t=5: before any right row
      200L -> -1L,   // user 2's only view is after the purchase
      300L -> -1L))  // user 3 has no right rows at all
  }

  test("eventsRetention: first-hour cohorts, distinct users per hour offset") {
    val dir = java.nio.file.Files.createTempDirectory("graft-retention").toString
    val h0 = 1700000000L - 1700000000L % 3600
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    Seq(
      (1L, ts(h0 + 10)), (1L, ts(h0 + 3600)), (1L, ts(h0 + 3 * 3600)),
      (2L, ts(h0 + 20)), (2L, ts(h0 + 25)), (2L, ts(h0 + 2 * 3600)), // same-hour dup counts once
      (3L, ts(h0 + 3600 + 5)), (3L, ts(h0 + 2 * 3600))) // later cohort
      .toDF("user_id", "ts").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.eventsRetention(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val h1 = h0 + 3600
    assert(got == Set(
      (h0, 0L, 2L), (h0, 1L, 1L), (h0, 2L, 1L), (h0, 3L, 1L),
      (h1, 0L, 1L), (h1, 1L, 1L)))
  }

  test("eventsAnomaly: integer z-test flags the spike hour only") {
    val dir = java.nio.file.Files.createTempDirectory("graft-anomaly").toString
    val h0 = 1700000000L - 1700000000L % 3600
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // type 'a': 8 hours of 2 then a 20-spike (a single outlier among N equal
    // baselines sits at sqrt(N)-sigma -> 3-sigma here, beyond the z=2 gate)
    val rows = (0 until 8).flatMap(h => Seq.fill(2)((ts(h0 + h * 3600L), "a"))) ++
      Seq.fill(20)((ts(h0 + 8 * 3600L), "a"))
    val df = rows.zipWithIndex.map { case ((t, ty), i) => (i.toLong, t, ty) }
      .toDF("user_id", "ts", "event_type")
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.eventsAnomaly(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3))).sortBy(_._1).toSeq
    assert(got.map(_._2) == Seq.fill(8)(2L) ++ Seq(20L))
    assert(got.map(_._3) == Seq.fill(8)(false) ++ Seq(true))
  }

  test("asofJoin: partition-invariant") {
    val left = (0 until 200).map(i => (i.toLong % 7, i.toLong * 3, i.toLong))
      .toDF("user_id", "t", "event_id")
    val right = (0 until 150).map(i => (i.toLong % 7, i.toLong * 4 + 1, 1000L + i))
      .toDF("user_id", "t", "event_id")
    def run(l: org.apache.spark.sql.DataFrame) =
      Relational.asofJoin(l, right, "user_id", "t", Seq("event_id"), Seq("event_id"))
        .collect().map(r => (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(run(left) == run(left.repartition(11)))
  }

  test("slidingChunks: stride overlap, clamped tail, short docs whole") {
    val docs = Seq(
      (0L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens, w=4 s=2
      (1L, "a b c"),                                  // under w: one whole chunk
      (2L, "x")).toDF("doc_id", "text")
    val got = Packing.slidingChunks(docs, col("text"), col("doc_id"), w = 4, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getString(2), r.getLong(3)))).toMap
    // starts 0,2,4,6 (6+4 >= 10 stops the series): 4 chunks
    assert(got.keys.count(_._1 == 0L) == 4)
    assert(got((0L, 0L)) == (("t1 t2 t3 t4", 4L)))
    assert(got((0L, 1L)) == (("t3 t4 t5 t6", 4L)))
    assert(got((0L, 3L)) == (("t7 t8 t9 t10", 4L)))
    assert(got((1L, 0L)) == (("a b c", 3L)))
    assert(got((2L, 0L)) == (("x", 1L)))
    // 11 tokens: starts 0,2,4,6,8 — last chunk clamps to 3 tokens
    val odd = Seq((9L, (1 to 11).map(i => s"u$i").mkString(" "))).toDF("doc_id", "text")
    val g2 = Packing.slidingChunks(odd, col("text"), col("doc_id"), w = 4, stride = 2)
      .collect().map(r => r.getLong(1) -> ((r.getString(2), r.getLong(3)))).toMap
    assert(g2.size == 5 && g2(4L) == (("u9 u10 u11", 3L)))
  }

  test("bucketedRangeJoin equals the naive non-equi join; [from, to) boundaries exact") {
    val points = Seq(5L, 10L, 19L, 20L, 35L, 99L).toDF("pt")
    val intervals = Seq(
      ("a", 0L, Some(20L)),   // [0, 20): catches 5, 10, 19 — NOT 20
      ("b", 10L, Some(40L)),  // catches 10, 19, 20, 35
      ("c", 30L, None)        // open: catches 35, 99
    ).toDF("k", "valid_from", "valid_to")
    for (width <- Seq(1L, 7L, 100L)) {
      val got = Relational.bucketedRangeJoin(points, intervals, "pt",
          "valid_from", "valid_to", bucketWidth = width, horizon = 200L)
        .select("pt", "k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set(
        (5L, "a"), (10L, "a"), (19L, "a"),
        (10L, "b"), (19L, "b"), (20L, "b"), (35L, "b"),
        (35L, "c"), (99L, "c")), s"width=$width")
    }
  }

  test("bucketedRangeJoin: an interval spanning too many buckets fails fast") {
    val points = Seq(1L).toDF("pt")
    val intervals = Seq(("x", 0L, Some(10000L))).toDF("k", "valid_from", "valid_to")
    val ex = intercept[Exception] {
      Relational.bucketedRangeJoin(points, intervals, "pt", "valid_from", "valid_to",
        bucketWidth = 1L, horizon = 20000L, maxBucketsPerInterval = 100L).collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("buckets"))
  }
}
