package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.DataFrame

/** Rich-club profile and bounded SimRank over hand-computed small graphs
  * (the cross-engine oracles pin the host-graph-scale behavior; these pin
  * the arithmetic and the edge cases). */
class RichClubSimRankSpec extends AnyFunSuite with SparkTestSession {

  private def edges(rows: (String, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("source", "target", "c")
  }

  test("richClub: clique-with-leaves has a perfect club above the leaf degree") {
    // triangle A-B-C plus one leaf per clique node: deg(A,B,C)=3, deg(L*)=1
    val e = edges(("A", "B", 1), ("B", "C", 1), ("A", "C", 1),
      ("A", "L1", 1), ("B", "L2", 1), ("C", "L3", 1))
    val got = GraphOps.richClub(e, maxK = 3).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    // k=1 and k=2: the club is {A,B,C}, fully interlinked -> phi = 1.0
    assert(got(1L) == ((3L, 3L, Some(1.0))))
    assert(got(2L) == ((3L, 3L, Some(1.0))))
    // k=3: no node has degree > 3 -> empty club, phi undefined (NULL)
    assert(got(3L) == ((0L, 0L, None)))
  }

  test("richClub: self-loops and duplicate edges are ignored") {
    val e = edges(("A", "B", 1), ("B", "A", 1), ("A", "A", 1))
    val got = GraphOps.richClub(e, maxK = 2).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // one simple edge, both endpoints degree 1 -> every club k>=1 is empty
    assert(got == Map(1L -> ((0L, 0L)), 2L -> ((0L, 0L))))
  }

  test("simRank: one shared in-neighbor gives C = 0.8 at both iterations") {
    val e = edges(("X", "A", 1), ("X", "B", 1))
    val got = GraphOps.simRank(e).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    // S1(A,B) = (4*1*1e6) div (5*1*1) = 800000; S2 via S1'(X,X)=1e6 -> same
    assert(got == Map(("A", "B") -> ((800000L, 800000L))))
  }

  test("simRank: second iteration propagates similarity one hop further") {
    // X -> {A,B} makes A~B at iter 1; A -> C, B -> D makes C~D ONLY at iter 2
    val e = edges(("X", "A", 1), ("X", "B", 1), ("A", "C", 1), ("B", "D", 1))
    val got = GraphOps.simRank(e).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got(("A", "B")) == ((800000L, 800000L)))
    // S1(C,D) = 0 (no common in-neighbor); S2(C,D) = (4*S1(A,B)) div 5 = 640000
    assert(got(("C", "D")) == ((0L, 640000L)))
    assert(got.keySet == Set(("A", "B"), ("C", "D")))
  }

  test("simRank: self-loops carry no similarity; nodes without in-edges emit nothing") {
    val e = edges(("A", "A", 1), ("A", "B", 1), ("Z", "Q", 1))
    assert(GraphOps.simRank(e).collect().isEmpty)
  }
}
