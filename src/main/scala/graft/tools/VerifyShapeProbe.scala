package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** A/B the jaccard verify-stage shapes in ONE session: (old) lazy candidates
  * + two full-corpus shingle-set derivations vs (new) checkpointed
  * candidates + semi-join-pruned single set derivation. */
object VerifyShapeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-vshape")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dd = spark.read.parquet(s"$sfDir/documents.parquet")
    def cand: DataFrame = Dedup.minhashCandidates(
      Dedup.minhashSignatures(dd, col("text"), col("doc_id"),
        bands = 4, shingleW = 2, rowsPerBand = 2))
    def oldShape: Long = {
      val sets = dd.select(col("doc_id").as("id"),
        array_distinct(Dedup.shingles(Dedup.tokens(col("text")), 2)).as("sh"))
      cand
        .join(sets.withColumnRenamed("id", "a_id").withColumnRenamed("sh", "a_sh"), "a_id")
        .join(sets.withColumnRenamed("id", "b_id").withColumnRenamed("sh", "b_sh"), "b_id")
        .select(col("a_id"), col("b_id"),
          (size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
            size(array_union(col("a_sh"), col("b_sh"))).cast("double")).as("jaccard"))
        .filter(col("jaccard") >= 0.2).count()
    }
    def newShape: Long =
      Dedup.jaccardVerify(dd, col("text"), col("doc_id"), cand, shingleW = 2)
        .filter(col("jaccard") >= 0.2).count()
    def best(reps: Int)(f: => Long): Double = {
      f
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    }
    // interleave so both see the same noise windows
    val pairs = (1 to 3).map(_ => (best(2)(oldShape), best(2)(newShape)))
    pairs.zipWithIndex.foreach { case ((o, n), i) =>
      println(f"[vshape] round$i old=$o%.3f new=$n%.3f")
    }
    println(f"[vshape] BEST old=${pairs.map(_._1).min}%.3f new=${pairs.map(_._2).min}%.3f")
    spark.stop()
  }
}
