package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** sssp, partitionStats, linkPredictionEval, and the doc-stance rollup over
  * small graphs: hand-computed expectations plus an INDEPENDENT Scala
  * reference implementation of the md5-keyed protocols (the cross-engine
  * oracle pins KG-scale behavior; these pin arithmetic and edge cases). */
class GraphEvalSpec extends AnyFunSuite with SparkTestSession {

  private def edges(rows: (String, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("source", "target", "c")
  }

  /** Independent copy of the repo md5 bucket hash (15 hex digits, mod m). */
  private def md5Mod(s: String, m: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % m
  }

  // ------------------------------------------------------------------- sssp

  test("sssp: two cheap hops beat one strong-evidence-free direct edge") {
    // cost = 1e6 div c: A->B direct costs 1e6, A->C->B costs 250k + 250k
    val e = edges(("A", "B", 1), ("A", "C", 4), ("C", "B", 4), ("B", "B", 9))
    val got = GraphOps.sssp(e, "A", rounds = 4).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("A" -> 0L, "C" -> 250000L, "B" -> 500000L))
  }

  test("sssp: parallel observations sum into the weight before the cost flip") {
    // two (A,B) rows sum to w=4 -> cost 250k, not min/first
    val e = edges(("A", "B", 1), ("A", "B", 3))
    val got = GraphOps.sssp(e, "A", rounds = 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("A" -> 0L, "B" -> 250000L))
  }

  test("sssp: rounds bound reachability; fractional weights fail fast") {
    val chain = edges(("A", "B", 1), ("B", "C", 1), ("C", "D", 1))
    val got = GraphOps.sssp(chain, "A", rounds = 2).collect()
      .map(r => r.getString(0)).toSet
    assert(got == Set("A", "B", "C")) // D is 3 hops out
    val bad = edges(("A", "B", 0.5))
    assertThrows[Exception](GraphOps.sssp(bad, "A", rounds = 1).collect())
  }

  // -------------------------------------------------------- partitionStats

  test("partitionStats: exact report vs an independent md5 replay") {
    // duplicate edge + self-loop collapse to 2 distinct simple edges
    val e = edges(("A", "B", 1), ("A", "B", 2), ("B", "C", 1), ("S", "S", 1))
    val parts = 8
    val simple = Seq(("A", "B"), ("B", "C"))
    val sp = simple.map { case (s, _) => md5Mod(s, parts) }
    val tp = simple.map { case (_, t) => md5Mod(t, parts) }
    val ep = simple.map { case (s, t) => md5Mod(s + "|" + t, parts) }
    def row(partOf: Int => Long, remote: Int => Long) = {
      val loads = simple.indices.groupBy(partOf).values.map(_.size.toLong)
      val repl = simple.indices.flatMap(i =>
        Seq((simple(i)._1, partOf(i)), (simple(i)._2, partOf(i)))).distinct
      val nNodes = repl.map(_._1).distinct.size.toLong
      (2L, loads.max, loads.min, simple.indices.map(remote).sum,
        repl.size.toLong, nNodes, repl.size.toLong * 1000 / nNodes)
    }
    val expSrc = row(sp(_), i => if (tp(i) != sp(i)) 1L else 0L)
    val expEdge = row(ep(_), i =>
      (if (sp(i) != ep(i)) 1L else 0L) + (if (tp(i) != ep(i)) 1L else 0L))
    val got = GraphOps.partitionStats(e, parts).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))).toMap
    assert(got("by_src") == expSrc)
    assert(got("by_edge") == expEdge)
    assert(got.keySet == Set("by_src", "by_edge"))
  }

  // --------------------------------------------------- linkPredictionEval

  test("linkPredictionEval: matches an independent reference implementation") {
    val pairs = Seq(("A", "B"), ("A", "C"), ("B", "C"), ("A", "D"), ("B", "D"),
      ("C", "E"), ("D", "E"), ("E", "F"), ("C", "F"))
    val e = edges(pairs.map { case (a, b) => (a, b, 1.0) }: _*)

    // reference implementation, plain Scala over the same md5 protocol
    val und = pairs.map { case (a, b) => if (a < b) (a, b) else (b, a) }.distinct
    val (test0, train) = und.partition { case (a, b) => md5Mod(s"$a|$b", 4) == 0 }
    assert(test0.nonEmpty && train.nonEmpty) // fixture exercises both splits
    val nbr = (train ++ train.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }.withDefaultValue(Set.empty[String])
    val nodes = und.flatMap(p => Seq(p._1, p._2)).distinct
    def score(x: String, y: String) = (nbr(x) & nbr(y)).size.toLong
    val expected = test0.map { case (u, v) =>
      val cand = nodes.filter(w => w != u &&
        !und.contains(if (u < w) (u, w) else (w, u)))
      val pos = score(u, v)
      val nBetter = cand.count(w =>
        score(u, w) > pos || (score(u, w) == pos && w < v)).toLong
      val rank = nBetter + 1
      (u, v, pos, cand.size.toLong, rank, 1000000L / rank,
        if (rank <= 1) 1L else 0L, if (rank <= 3) 1L else 0L)
    }.toSet

    val got = GraphOps.linkPredictionEval(e, testMod = 4).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(got == expected)
    // human-readable anchor: (A,D) has pos score 0, both candidates (E, F)
    // share one common neighbor with A -> rank 3, hits@3 only
    assert(got.contains(("A", "D", 0L, 2L, 3L, 333333L, 0L, 1L)))
  }

  // -------------------------------------------------------------- stance

  test("stanceFromTriples: majority polarity per (doc, object), ties -> neu") {
    import spark.implicits._
    val t = Seq(
      (1L, "pos", "spark", "ORG"), (1L, "pos", "spark", "ORG"),
      (1L, "neg", "spark", "ORG"),
      (1L, "neg", "table", "LOC"), (1L, "neu", "table", "LOC"),
      (1L, "neg", "table", "LOC"),
      (2L, "pos", "spark", "ORG"), (2L, "neg", "spark", "ORG"))
      .toDF("doc_id", "pred", "obj", "obj_type")
    val got = graft.ops.DocKg.stanceFromTriples(t).collect()
      .map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6)))).toMap
    assert(got((1L, "spark")) == ((2L, 1L, 3L, "pos")))
    assert(got((1L, "table")) == ((0L, 2L, 3L, "neg")))
    assert(got((2L, "spark")) == ((1L, 1L, 2L, "neu")))
  }
}
