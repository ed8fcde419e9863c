package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone driver for Bench.skewSection — the hot-entity skew stress
  * (unsalted vs salted radial rollup at hot_permille 0 and 300) without
  * paying for the whole bench. `runMain graft.tools.SkewProbe`. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-skewprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("{" + graft.Bench.skewSection(spark, cpus) + "}")
    spark.stop()
  }
}
