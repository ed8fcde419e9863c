package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-6 fine-grained probe: per-branch costs of typedSupplyTriples. */
object SupplyProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = if (args.length > 0) args(0).toInt else 4
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-supply-probe2")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def best(label: String)(work: => Any): Unit = {
      work
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); work; (System.nanoTime() - t0) / 1e9
      }
      println(f"[supply2] $label best=${ts.min}%.3f reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    best("li.scan2col")(li.select("l_orderkey", "l_partkey").count())
    best("li.op.distinct")(li.select("l_orderkey", "l_partkey").distinct().count())
    best("li.ps.distinct")(li.select("l_partkey", "l_suppkey").distinct().count())
    best("li.both.distinct") {
      li.select(col("l_orderkey").as("a"), col("l_partkey").as("b")).distinct()
        .union(li.select(col("l_partkey"), col("l_suppkey")).distinct()).count()
    }
    best("li.op.distinct.concat") {
      li.select(col("l_orderkey").as("a"), col("l_partkey").as("b")).distinct()
        .select(concat(lit("O"), col("a")).as("s"), concat(lit("P"), col("b")).as("o"))
        .count()
    }
    best("orders.concat") {
      spark.read.parquet(s"$sfDir/orders.parquet")
        .select(concat(lit("C"), col("o_custkey")).as("s"),
          concat(lit("O"), col("o_orderkey")).as("o")).count()
    }
    best("typed.full")(graft.ops.DocKg.typedSupplyTriples(spark, sfDir).count())
    spark.stop()
  }
}
