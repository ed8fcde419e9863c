package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

class PageRankSpec extends AnyFunSuite with SparkTestSession {

  /** Local reference implementation of the exact recurrence (same integer
    * arithmetic, driver-side maps). */
  private def localPageRank(edges: Seq[(String, String, Long)], iters: Int): Map[String, Long] = {
    val ew = edges.groupBy(e => (e._1, e._2)).view.mapValues(_.map(_._3).sum).toMap
    val ow = ew.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nodes = (ew.keys.map(_._1) ++ ew.keys.map(_._2)).toSet
    val t = 1000000000000L / nodes.size
    val base = (15L * t) / 100L
    var r = nodes.map(_ -> t).toMap
    for (_ <- 1 to iters) {
      val cin = ew.toSeq
        .map { case ((u, v), w) => v -> (85L * r(u) * w) / (100L * ow(u)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = nodes.map(v => v -> (base + cin.getOrElse(v, 0L))).toMap
    }
    r
  }

  private val edges = Seq(
    ("a", "b", 3L), ("a", "c", 1L), ("b", "c", 2L),
    ("c", "a", 1L), ("d", "c", 5L)) // d is a source-only node; no edge into d

  private def edgesDf = {
    import spark.implicits._
    edges.map { case (s, t, c) => (s, t, "pos", c.toDouble) }
      .toDF("source", "target", "sent", "c")
  }

  test("matches the local reference recurrence exactly") {
    val expected = localPageRank(edges, iters = 3)
    val got = GraphOps.pageRank(edgesDf, iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // sanity on the values themselves: d (no in-edges) ranks below everything
    assert(Seq("a", "b", "c").forall(v => got(v) > got("d")))
    // d has no in-edges: teleport mass only
    assert(got("d") == (15L * (1000000000000L / 4)) / 100L)
  }

  test("bit-identical under repartitioning (integer arithmetic, no float order)") {
    val a = GraphOps.pageRank(edgesDf.repartition(7), iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = GraphOps.pageRank(edgesDf.coalesce(1), iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("mass never exceeds the fixed-point total; every node keeps teleport mass") {
    val rows = GraphOps.pageRank(edgesDf, iters = 4).collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total <= 1000000000000L, s"mass inflated: $total")
    val base = (15L * (1000000000000L / 4)) / 100L
    assert(rows.forall(_.getLong(1) >= base))
  }

  test("guards: fractional (normalized) weights raise instead of truncating to teleport-only") {
    import spark.implicits._
    val normalized = Seq(("a", "b", "pos", 0.5), ("b", "a", "pos", 1.0))
      .toDF("source", "target", "sent", "c")
    val ex = intercept[Exception] {
      GraphOps.pageRank(normalized, iters = 1).collect()
    }
    assert(ex.getMessage.contains("integral edge weights"), ex.getMessage)
    val huge = Seq(("a", "b", "pos", 200000.0), ("b", "a", "pos", 1.0))
      .toDF("source", "target", "sent", "c")
    val ex2 = intercept[Exception] {
      GraphOps.pageRank(huge, iters = 1).collect()
    }
    assert(ex2.getMessage.contains("out of (0, 100000]"), ex2.getMessage)
  }

  test("multigraph edges (parallel sents) collapse into one weight") {
    import spark.implicits._
    val multi = Seq(("a", "b", "pos", 2.0), ("a", "b", "neg", 1.0), ("b", "a", "pos", 1.0))
      .toDF("source", "target", "sent", "c")
    val got = GraphOps.pageRank(multi, iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = localPageRank(Seq(("a", "b", 3L), ("b", "a", 1L)), iters = 3)
    assert(got == expected)
  }
}
