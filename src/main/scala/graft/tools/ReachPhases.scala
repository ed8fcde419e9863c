package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase split of kg_reachability: step-relation materialization vs the
  * semi-naive closure loop on a pre-materialized step. */
object ReachPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-reachphases")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def rel = graft.ops.DocKg.typedSupplyTriples(spark, sfDir).select("s", "p", "o")
    val preds = Seq("contains", "supplied_by", "located_in")
    def time(label: String, reps: Int = 3)(f: => Any): Unit = {
      f
      val best = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[reachph] $label%-24s best=$best%.3f")
    }
    time("step_ckpt") {
      rel.filter(col("p").isin(preds: _*))
        .select(col("s").as("hs"), col("o").as("ho"))
        .localCheckpoint(true).unpersist(true)
    }
    val step = rel.filter(col("p").isin(preds: _*))
      .select(col("s").as("hs"), col("o").as("ho")).localCheckpoint(true)
    step.count()
    time("loop_on_ckpt") {
      // mirror Bgp.reachability's loop on the materialized step
      graft.ops.Bgp.reachability(
        step.select(col("hs").as("s"), lit("x").as("p"), col("ho").as("o")),
        Seq("x"), seeds = Seq("O0", "O1", "O2"), distinctInput = true).count()
    }
    time("full_query") {
      graft.ops.Bgp.reachability(rel, preds,
        seeds = Seq("O0", "O1", "O2"), distinctInput = true).count()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("loop_on_ckpt_noaqe") {
      graft.ops.Bgp.reachability(
        step.select(col("hs").as("s"), lit("x").as("p"), col("ho").as("o")),
        Seq("x"), seeds = Seq("O0", "O1", "O2"), distinctInput = true).count()
    }
    time("full_query_noaqe") {
      graft.ops.Bgp.reachability(rel, preds,
        seeds = Seq("O0", "O1", "O2"), distinctInput = true).count()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
