package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke: the driver's entry + queries contract. */
object EntryProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[entry] rows=$n")
    require(n > 0)
    // every query key has an oracle or is intentionally rows-only
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"[entry] queries=${q.size} oracles=${o.size} missing=${q.diff(o)}")
    spark.stop()
  }
}
