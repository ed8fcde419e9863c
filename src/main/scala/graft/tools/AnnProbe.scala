package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-6 phase probe for the ANN composite queries: times coarse
  * training, residual checkpoint, PQ training, and the final search
  * separately (best-of-k) to attribute ann_ivf_pq's wall cost. */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = if (args.length > 0) args(0).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-ann-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Similarity
    def best(label: String)(work: => Any): Unit = {
      work
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); work; (System.nanoTime() - t0) / 1e9
      }
      println(f"[ann] $label best=${ts.min}%.3f reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    best("coarse.kmeans(k=8,it=2)")(
      Similarity.kmeansCentroids(e, col("vec_id"), col("embedding"), k = 8, iters = 2))
    val coarse = Similarity.kmeansCentroids(e, col("vec_id"), col("embedding"), k = 8, iters = 2)
    best("ivfpq.full") {
      Similarity.ivfPqTopK(e, e.filter(col("vec_id") < 20), col("vec_id"),
        col("embedding"), dim = 64, coarse, m = 2, ksub = 4, iters = 2, k = 5).count()
    }
    best("pq.codebooks(m=2,ksub=4,it=2)")(
      Similarity.pqCodebooks(e, col("vec_id"), col("embedding"), 64, 2, 4, 2))
    spark.stop()
  }
}
