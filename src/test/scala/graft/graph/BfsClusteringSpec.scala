package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.DataFrame

/** Frontier BFS distances and local clustering coefficient on hand-computed
  * graphs (the cross-engine oracle pins KG-scale behavior; these pin the
  * semantics and edge cases). */
class BfsClusteringSpec extends AnyFunSuite with SparkTestSession {

  private def edges(rows: (String, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (a, b) => (a, b, 1.0) }.toDF("source", "target", "c")
  }

  test("bfs: hop distances on a directed chain with a shortcut") {
    // A->B->C->D plus A->C: C is 1 hop (shortcut wins over the 2-hop path)
    val e = edges(("A", "B"), ("B", "C"), ("C", "D"), ("A", "C"))
    val got = GraphOps.bfs(e, "A", rounds = 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("A" -> 0L, "B" -> 1L, "C" -> 1L, "D" -> 2L))
  }

  test("bfs: direction respected; unreachable nodes absent; rounds cap the radius") {
    val e = edges(("A", "B"), ("B", "C"), ("C", "D"), ("X", "A"))
    // X reaches A but A never reaches X (directed)
    val got = GraphOps.bfs(e, "A", rounds = 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("A" -> 0L, "B" -> 1L, "C" -> 2L, "D" -> 3L))
    // rounds=2 stops before D
    val capped = GraphOps.bfs(e, "A", rounds = 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(capped == Map("A" -> 0L, "B" -> 1L, "C" -> 2L))
  }

  test("bfs: a settled node is never re-expanded to a larger distance (cycle)") {
    val e = edges(("A", "B"), ("B", "A"), ("B", "C"))
    val got = GraphOps.bfs(e, "A", rounds = 4).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("A" -> 0L, "B" -> 1L, "C" -> 2L))
  }

  test("bfs: source with no out-edges is just itself at distance 0") {
    val e = edges(("A", "B"))
    val got = GraphOps.bfs(e, "Z", rounds = 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("Z" -> 0L))
  }

  test("clusteringCoeff: triangle plus pendant — exact corner counts") {
    // triangle A-B-C, pendant D off A; direction/multiplicity must not matter
    val e = edges(("A", "B"), ("B", "C"), ("C", "A"), ("A", "D"), ("B", "A"))
    val got = GraphOps.clusteringCoeff(e).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // A: deg 3 (B,C,D), 1 triangle -> 2*1/(3*2) = 1/3
    assert(got("A") == ((3L, 1L, 1.0 / 3.0)))
    assert(got("B") == ((2L, 1L, 1.0)))
    assert(got("C") == ((2L, 1L, 1.0)))
    // D: deg 1 -> filtered before the division (total under ANSI)
    assert(!got.contains("D"))
  }

  test("clusteringCoeff: star has zero triangles, coeff 0 at the hub") {
    val e = edges(("H", "A"), ("H", "B"), ("H", "C"))
    val got = GraphOps.clusteringCoeff(e).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map("H" -> ((3L, 0L, 0.0))))
  }

  private def truss(e: org.apache.spark.sql.DataFrame, k: Long, rounds: Int = 3) =
    GraphOps.kTruss(e, k, rounds).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap

  test("kTruss: 3-truss keeps triangles, prunes the bridge between them") {
    val e = edges(("A", "B"), ("B", "C"), ("C", "A"), // triangle 1
      ("X", "Y"), ("Y", "Z"), ("Z", "X"),             // triangle 2
      ("C", "X"))                                     // bridge: in no triangle
    val got = truss(e, k = 3)
    assert(got.keySet == Set(("A", "B"), ("B", "C"), ("A", "C"),
      ("X", "Y"), ("Y", "Z"), ("X", "Z")))
    assert(got.values.forall(_ == 1L), s"each truss edge in exactly 1 triangle: $got")
  }

  test("kTruss: 4-truss keeps K4 (support 2 everywhere), kills the diamond by cascade") {
    val k4 = edges(("A", "B"), ("A", "C"), ("A", "D"), ("B", "C"), ("B", "D"), ("C", "D"))
    val gotK4 = truss(k4, k = 4)
    assert(gotK4.size == 6 && gotK4.values.forall(_ == 2L), s"$gotK4")
    // diamond = K4 minus {A,D}: only (B,C) sits in 2 triangles, but dropping
    // the support-1 edges destroys those triangles -> everything peels away
    val diamond = edges(("A", "B"), ("A", "C"), ("B", "C"), ("B", "D"), ("C", "D"))
    assert(truss(diamond, k = 4).isEmpty)
  }

  test("kTruss: k=2 keeps every simple edge (threshold 0), support reported") {
    val e = edges(("A", "B"), ("B", "C"), ("C", "A"), ("C", "D"))
    val got = truss(e, k = 2, rounds = 1)
    assert(got(("C", "D")) == 0L && got(("A", "B")) == 1L && got.size == 4)
  }

  test("degreeHistogram: star collapses to two buckets; duplicates/self-loops ignored") {
    val e = edges(("H", "A"), ("A", "H"), ("H", "B"), ("H", "C"), ("H", "H"))
    val got = GraphOps.degreeHistogram(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(3L -> 1L, 1L -> 3L))
  }

  test("assortativity: star is perfectly disassortative (r = -1)") {
    val e = edges(("H", "A"), ("H", "B"), ("H", "C"))
    val row = GraphOps.assortativity(e).collect()(0)
    assert(row.getLong(0) == 6L && row.getLong(1) == 12L &&
      row.getLong(2) == 18L && row.getLong(3) == 30L)
    assert(row.getDouble(4) == -1.0)
  }

  test("assortativity: regular graph (K4) has undefined r -> NaN, no ANSI error") {
    val k4 = edges(("A", "B"), ("A", "C"), ("A", "D"), ("B", "C"), ("B", "D"), ("C", "D"))
    val r = GraphOps.assortativity(k4).collect()(0).getDouble(4)
    assert(r.isNaN)
  }

  test("randomWalks: every hop is a real edge, sinks end walks, walks are deterministic") {
    val e = edges(("A", "B"), ("B", "A"), ("B", "C"), ("D", "A"))
    val adj = Set(("A", "B"), ("B", "A"), ("B", "C"), ("D", "A"))
    val rows = GraphOps.randomWalks(e, walkLen = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // step 0 is every node
    assert(rows.filter(_._2 == 0L).map(_._3).toSet == Set("A", "B", "C", "D"))
    // consecutive steps of one walk follow real directed edges
    val byWalk = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq)
    byWalk.foreach { case (start, path) =>
      path.sliding(2).foreach { case Seq(u, v) =>
        assert(adj.contains((u, v)), s"walk from $start took non-edge $u->$v")
      case _ => () }
    }
    // C is a sink: its walk is just the start row
    assert(byWalk("C") == Seq("C"))
    // determinism + partition invariance
    val again = GraphOps.randomWalks(e.repartition(7), walkLen = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(again == rows.sorted.toSeq)
  }

  test("reciprocity: half the chain reciprocated; self-loops and duplicates ignored") {
    val e = edges(("A", "B"), ("B", "A"), ("B", "C"), ("C", "D"), ("D", "C"),
      ("A", "B"), ("E", "E"))
    val row = GraphOps.reciprocity(e).collect()(0)
    // distinct directed edges: AB BA BC CD DC -> 4 of 5 reciprocated
    assert((row.getLong(0), row.getLong(1)) == ((5L, 4L)))
    assert(row.getDouble(2) == 0.8)
  }

  test("componentSizes: histogram over linked components only") {
    // one 3-node component, two 2-node components
    val e = edges(("A", "B"), ("B", "C"), ("X", "Y"), ("P", "Q"))
    val got = GraphOps.componentSizes(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(3L -> 1L, 2L -> 2L))
  }

  test("walkPairs: window-2 skip-gram counts on a hand-built walk relation") {
    import spark.implicits._
    // one walk A,B,C,D and one walk X,Y — window 2, both directions
    val walks = (Seq(("A", 0L, "A"), ("A", 1L, "B"), ("A", 2L, "C"), ("A", 3L, "D")) ++
      Seq(("X", 0L, "X"), ("X", 1L, "Y"))).toDF("start", "step", "node")
    val got = GraphOps.walkPairs(walks, window = 2).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val expected = Map(
      ("A", "B") -> 1L, ("A", "C") -> 1L, ("B", "A") -> 1L, ("B", "C") -> 1L,
      ("B", "D") -> 1L, ("C", "A") -> 1L, ("C", "B") -> 1L, ("C", "D") -> 1L,
      ("D", "B") -> 1L, ("D", "C") -> 1L, ("X", "Y") -> 1L, ("Y", "X") -> 1L)
    assert(got == expected, s"got $got")
  }
}
