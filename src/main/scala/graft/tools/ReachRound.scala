package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One semi-naive reachability round, instrumented: join strategy + wall. */
object ReachRound {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-reachround")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rel = graft.ops.DocKg.typedSupplyTriples(spark, sfDir).select("s", "p", "o")
    val step = rel.filter(col("p").isin("contains", "supplied_by", "located_in"))
      .select(col("s").as("hs"), col("o").as("ho")).localCheckpoint(true)
    println(s"[rr] step rows=${step.count()}")
    val start = step.filter(col("hs").isin("O0", "O1", "O2"))
      .select(col("hs").as("x"), col("ho").as("z")).localCheckpoint(true)
    println(s"[rr] start rows=${start.count()}")
    val fresh = start.join(step, col("z") === col("hs"))
      .select(col("x"), col("ho").as("z")).distinct()
      .join(start, Seq("x", "z"), "left_anti")
    println(fresh.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode))
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[rr] $label ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    t("round_ckpt_1")(fresh.localCheckpoint(true).unpersist(true))
    t("round_ckpt_2")(fresh.localCheckpoint(true).unpersist(true))
    t("round_ckpt_3")(fresh.localCheckpoint(true).unpersist(true))
    t("round_count")(fresh.count())
    spark.stop()
  }
}
