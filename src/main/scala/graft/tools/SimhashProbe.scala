package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-6 phase probe for dedup_simhash_pairs. */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = if (args.length > 0) args(0).toInt else 4
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-sh-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Dedup
    def best(label: String)(work: => Any): Unit = {
      work
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); work; (System.nanoTime() - t0) / 1e9
      }
      println(f"[sh] $label best=${ts.min}%.3f reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    best("sig64.count")(Dedup.simhash(docs, col("text"), col("doc_id"), bits = 64).count())
    best("sig64.ckpt") {
      val d = Dedup.simhash(docs, col("text"), col("doc_id"), bits = 64).localCheckpoint()
      d.unpersist()
    }
    val sh = Dedup.simhash(docs, col("text"), col("doc_id"), bits = 64).localCheckpoint()
    best("cand.count") {
      val w = 16
      val chunkRows = sh.select(col("id"),
        posexplode(array((0 until 4).map(k =>
          substring(col("simhash"), k * w + 1, w)): _*)))
        .select(col("id"), col("pos").as("band"), col("col").as("sig"))
      Dedup.minhashCandidates(chunkRows, 1000).count()
    }
    best("full")(graft.SparkEntry.queries("dedup_simhash_pairs")(spark, sfDir).count())
    spark.stop()
  }
}
