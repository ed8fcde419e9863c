package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-6 A/B: kg_shape_cardinality with the checkpointed typed relation
  * (current) vs a fully lazy form that leans on exchange reuse. */
object ShapeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = if (args.length > 0) args(0).toInt else 4
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-shape-probe")
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
      println(f"[shape] $label best=${ts.min}%.3f reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    best("current")(
      graft.SparkEntry.queries("kg_shape_cardinality")(spark, sfDir).count())
    best("lazy") {
      val t = graft.ops.DocKg.typedSupplyTriples(spark, sfDir)
        .select("s", "s_type", "p", "o", "o_type")
      val shapes = Seq(("ORDER", "contains", 2L, 5L),
        ("SUPPLIER", "located_in", 1L, 1L), ("CUSTOMER", "placed", 1L, 15L))
      import spark.implicits._
      val shapeDf = shapes.toDF("focusType", "pred", "minCount", "maxCount")
      val preds = shapes.map(_._2).distinct
      val fts = shapes.map(_._1).distinct
      val counts = t.filter(col("p").isin(preds: _*))
        .groupBy(col("s").as("cfocus"), col("p").as("cpred"))
        .agg(count(lit(1)).as("cnt"))
      val nodes = t.select(col("s").as("focus"), col("s_type").as("ftype"))
        .union(t.select(col("o").as("focus"), col("o_type").as("ftype")))
        .filter(col("ftype").isin(fts: _*))
        .distinct()
      nodes
        .join(broadcast(shapeDf), col("ftype") === col("focusType"))
        .join(counts, col("focus") === col("cfocus") && col("pred") === col("cpred"),
          "left_outer")
        .select(col("focus"), col("pred"),
          coalesce(col("cnt"), lit(0L)).as("observed"),
          col("minCount"), col("maxCount"))
        .filter(col("observed") < col("minCount") || col("observed") > col("maxCount"))
        .count()
    }
    spark.stop()
  }
}
