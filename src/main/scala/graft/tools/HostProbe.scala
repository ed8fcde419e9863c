package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Break down the web/host-graph iterative queries: time the hostEdges
  * derivation separately from the iterative loop run over pre-materialized
  * edges. `runMain graft.tools.HostProbe [sfDir]`. */
object HostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-hostprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def hostEdges: DataFrame = {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      graft.ops.WebGraph.hostGraph(graft.ops.WebGraph.extractLinks(
          graft.ops.WebGraph.syntheticLinkedPages(docs, col("doc_id"), col("text")),
          col("html"), col("url")))
        .select(col("src_host").as("source"), col("dst_host").as("target"),
          col("n_links").cast("double").as("c"))
    }
    def time(label: String, reps: Int = 3)(f: => Any): Unit = {
      f // warm
      val best = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[hostprobe] $label%-28s best=$best%.3f")
    }
    time("links_extract_only") {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      graft.ops.WebGraph.extractLinks(
        graft.ops.WebGraph.syntheticLinkedPages(docs, col("doc_id"), col("text")),
        col("html"), col("url"))
        .write.format("noop").mode("overwrite").save()
    }
    time("hostEdges_ckpt") { hostEdges.localCheckpoint(true).unpersist(true) }
    val e = hostEdges.localCheckpoint(true)
    e.count()
    time("bowtie_on_ckpt") { graft.graph.GraphOps.bowTie(e, rounds = 3).count() }
    time("simrank_on_ckpt") { graft.graph.GraphOps.simRank(e).count() }
    time("sssp_on_ckpt") { graft.graph.GraphOps.sssp(e, "h1.example.test", rounds = 4).count() }
    time("richclub_on_ckpt") { graft.graph.GraphOps.richClub(e, maxK = 8).count() }
    time("bowtie_full") { graft.graph.GraphOps.bowTie(hostEdges, rounds = 3).count() }
    // phase split of exactly what bowTie does internally on the derived input
    time("phase_adj_ckpt") {
      hostEdges.filter(col("source") =!= col("target"))
        .select(col("source").as("src"), col("target").as("dst"))
        .distinct().localCheckpoint(true).unpersist(true)
    }
    val adj2 = hostEdges.filter(col("source") =!= col("target"))
      .select(col("source").as("src"), col("target").as("dst"))
      .distinct().localCheckpoint(true)
    time("phase_nodes_ckpt") {
      adj2.select(col("src").as("id"))
        .union(adj2.select(col("dst").as("id"))).distinct()
        .localCheckpoint(true).unpersist(true)
    }
    time("simrank_full") { graft.graph.GraphOps.simRank(hostEdges).count() }
    time("sssp_full") { graft.graph.GraphOps.sssp(hostEdges, "h1.example.test", rounds = 4).count() }
    spark.stop()
  }
}
