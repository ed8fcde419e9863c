package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** DocKg.pmiFromRelation (integer-log2 PMI) and Similarity.recallAtK —
  * hand-computed expectations. */
class PmiRecallSpec extends AnyFunSuite with SparkTestSession {

  test("pmi: hand-computed marginals and floor-log2 pmi") {
    import spark.implicits._
    // (A,X) x4, (A,Y) x1, (B,X) x1, (B,Y) x2 -> N = 8
    val rel = (Seq.fill(4)(("A", "X")) ++ Seq(("A", "Y"), ("B", "X")) ++
      Seq.fill(2)(("B", "Y"))).toDF("source", "target")
    val got = DocKg.pmiFromRelation(rel).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // marginals: n_A=5 n_B=3 ; n_X=5 n_Y=3
    // ipmi(A,X) = ilog2(4*8=32)=5 - ilog2(5*5=25)=4 -> 1
    assert(got(("A", "X")) == ((4L, 5L, 5L, 1L)))
    // ipmi(A,Y) = ilog2(8)=3 - ilog2(15)=3 -> 0
    assert(got(("A", "Y")) == ((1L, 5L, 3L, 0L)))
    assert(got(("B", "X")) == ((1L, 3L, 5L, 0L)))
    // ipmi(B,Y) = ilog2(16)=4 - ilog2(9)=3 -> 1
    assert(got(("B", "Y")) == ((2L, 3L, 3L, 1L)))
  }

  test("pmi: partition-invariant (exact integer arithmetic)") {
    import spark.implicits._
    val rel = (1 to 200).map(i => (s"s${i % 7}", s"t${i % 13}")).toDF("source", "target")
    val a = DocKg.pmiFromRelation(rel).collect().map(_.toSeq).toSet
    val b = DocKg.pmiFromRelation(rel.repartition(11)).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("triangles: direction/multiplicity collapse, each triangle exactly once as a<b<c") {
    import spark.implicits._
    // A-B (both directions + repeat), B-C, A-C, C-D: one triangle (A,B,C)
    val e = Seq(("A", "B"), ("B", "A"), ("A", "B"), ("B", "C"), ("C", "A"), ("C", "D"))
      .toDF("source", "target")
    val got = DocKg.trianglesFromEdges(e).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(("A", "B", "C")))
    // no self-loop artifacts
    val loops = Seq(("A", "A"), ("A", "B"), ("B", "C"), ("A", "C")).toDF("source", "target")
    assert(DocKg.trianglesFromEdges(loops).collect().length == 1)
  }

  test("recallAtK: hits counted per query; zero-overlap queries emit recall 0") {
    import spark.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L), (2L, 22L))
      .toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 11L), (1L, 12L), (1L, 99L), (2L, 98L), (2L, 97L), (2L, 96L))
      .toDF("query_id", "neighbor_id")
    val got = Similarity.recallAtK(exact, approx, k = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((2L, 2.0 / 3.0)))
    assert(got(2L) == ((0L, 0.0)))
  }

  test("recallAtK: identical sets give recall 1.0 for every query") {
    import spark.implicits._
    val s = Seq((1L, 5L), (1L, 6L), (2L, 7L), (2L, 8L)).toDF("query_id", "neighbor_id")
    val got = Similarity.recallAtK(s, s, k = 2).collect().map(_.getDouble(2))
    assert(got.length == 2 && got.forall(_ == 1.0))
  }
}
