package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

class PackingSpec extends AnyFunSuite with SparkTestSession {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("manifest: offsets are the exclusive prefix sum in id order; spans cover tokens") {
    val d = docs(1L -> "a b c", 2L -> "d e", 5L -> "f g h i j", 9L -> "k")
    val got = Packing.packChunks(d, col("text"), col("doc_id"), chunkTokens = 4)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 3L, 0L, 0L, 0L),   // tokens [0,3)   -> chunk 0
      (2L, 2L, 3L, 0L, 1L),   // tokens [3,5)   -> straddles chunks 0-1
      (5L, 5L, 5L, 1L, 2L),   // tokens [5,10)  -> chunks 1-2
      (9L, 1L, 10L, 2L, 2L)))
  }

  test("partitioning- and block-size-invariant: same manifest under any layout") {
    val d = docs((1L to 40L).map(i => i -> ("tok " * (i % 7 + 1).toInt).trim): _*)
    def manifest(df: org.apache.spark.sql.DataFrame, bs: Long) =
      Packing.packChunks(df, col("text"), col("doc_id"), chunkTokens = 8, blockSize = bs)
        .orderBy("id").collect().map(_.toSeq).toSeq
    val base = manifest(d, bs = 4)
    assert(manifest(d.repartition(7), bs = 4) == base)
    assert(manifest(d, bs = 1) == base)            // one doc per block
    assert(manifest(d, bs = 1000000) == base)      // all docs in one block
  }

  test("weightedSample: endpoints and clamping") {
    val d = docs((1L to 100L).map(i => i -> "x"): _*)
    assert(Sampling.weightedSample(d, col("doc_id"), lit(1.0)).count() == 100)
    assert(Sampling.weightedSample(d, col("doc_id"), lit(0.0)).count() == 0)
    // out-of-range weights clamp rather than throw or overshoot
    assert(Sampling.weightedSample(d, col("doc_id"), lit(7.5)).count() == 100)
    assert(Sampling.weightedSample(d, col("doc_id"), lit(-3.0)).count() == 0)
    // NaN (a broken score, e.g. 0/0) clamps to 0, not to "always keep"
    assert(Sampling.weightedSample(d, col("doc_id"), lit(Double.NaN)).count() == 0)
    // null weights drop
    assert(Sampling.weightedSample(d, col("doc_id"),
      lit(null).cast("double")).count() == 0)
    // a data-dependent weight keeps a deterministic, repartition-invariant set
    val w = col("doc_id") / lit(100.0)
    val a = Sampling.weightedSample(d, col("doc_id"), w).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedSample(d.repartition(13), col("doc_id"), w)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty && a.size < 100)
  }
}
