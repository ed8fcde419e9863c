package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** ops/Similarity SQ8 scalar quantization: codebook stats, code range
  * invariants, and integer-dot top-k agreement with a hand-checked answer. */
class Sq8Spec extends AnyFunSuite with SparkTestSession {

  private def vecs(rows: (Long, Seq[Double])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("sq8Stats: per-dimension min/max in dimension order") {
    val df = vecs(1L -> Seq(0.0, 5.0, -2.0), 2L -> Seq(4.0, 1.0, -2.0))
    val (mn, mx) = Similarity.sq8Stats(df, col("embedding"), dim = 3)
    assert(mn.toSeq == Seq(0.0, 1.0, -2.0))
    assert(mx.toSeq == Seq(4.0, 5.0, -2.0))
  }

  test("sq8Stats: ragged vectors fail fast") {
    val df = vecs(1L -> Seq(0.0, 1.0), 2L -> Seq(4.0, 1.0))
    intercept[IllegalArgumentException] {
      Similarity.sq8Stats(df, col("embedding"), dim = 3)
    }
  }

  test("sq8Quantize: min -> 0, max -> 255, constant dimension -> 0") {
    val df = vecs(1L -> Seq(0.0, 9.0, 7.0), 2L -> Seq(4.0, 1.0, 7.0))
    val (mn, mx) = Similarity.sq8Stats(df, col("embedding"), dim = 3)
    val q = Similarity.sq8Quantize(df, col("vec_id"), col("embedding"), mn, mx)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(q(1L) == Seq(0L, 255L, 0L)) // min dim0, max dim1, constant dim2
    assert(q(2L) == Seq(255L, 0L, 0L))
    // all codes within [0, 255]
    assert(q.values.flatten.forall(c => c >= 0L && c <= 255L))
  }

  test("sq8TopK: integer-dot ranking matches hand computation") {
    val df = vecs(
      1L -> Seq(1.0, 0.0), // query
      2L -> Seq(1.0, 0.1), // nearly parallel -> best
      3L -> Seq(0.0, 1.0), // orthogonal
      4L -> Seq(0.5, 0.5))
    val (mn, mx) = Similarity.sq8Stats(df, col("embedding"), dim = 2)
    val qz = Similarity.sq8Quantize(df, col("vec_id"), col("embedding"), mn, mx)
    val top = Similarity.sq8TopK(qz, qz.filter(col("id") === 1L), k = 3)
      .orderBy("rank").collect()
    assert(top.map(_.getLong(0)).toSeq.forall(_ == 1L))
    // codes: q1=(255,0) q2=(255,25) q3=(0,255) q4=(127,127)
    // dots:  q2 -> 255*255 = 65025; q4 -> 255*127 = 32385; q3 -> 0
    assert(top.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      Seq((2L, 65025L), (4L, 32385L), (3L, 0L)))
  }

  test("sq8 codes are integer-exact: re-quantizing is deterministic") {
    val df = vecs((0L to 20L).map(i => i -> Seq(i * 0.37 - 3.0, math.sin(i.toDouble))): _*)
    val (mn, mx) = Similarity.sq8Stats(df, col("embedding"), dim = 2)
    val a = Similarity.sq8Quantize(df, col("vec_id"), col("embedding"), mn, mx)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = Similarity.sq8Quantize(df.repartition(7), col("vec_id"), col("embedding"), mn, mx)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b)
  }
}
