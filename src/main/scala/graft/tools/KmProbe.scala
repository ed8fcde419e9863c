package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Timing split for the learned-IVF query (not product surface):
  * training (maximin + Lloyd) vs assignment vs search. */
object KmProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("km-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    e.count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 3).foreach { i =>
      println(s"--- round $i")
      val cents = t("train")(graft.ops.Similarity.kmeansCentroids(
        e, col("vec_id"), col("embedding"), k = 8, iters = 2))
      t("assign")(graft.ops.Similarity.kmeansAssign(
        e, col("vec_id"), col("embedding"), cents).count())
      t("topk")(graft.ops.Similarity.kmeansTopK(
        e, e.filter(col("vec_id") < 50), col("vec_id"), col("embedding"),
        k = 3, cents).count())
    }
    spark.stop()
  }
}
