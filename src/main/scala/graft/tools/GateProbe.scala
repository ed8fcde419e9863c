package graft.tools

import org.apache.spark.sql.SparkSession

/** Measurement-methodology probe for the N->4N scaling gate (not part of the
  * product surface). Quantifies the fixed per-measurement driver overhead of
  * `df.count()` (Catalyst re-analysis + re-optimization of the deep typed
  * plan on EVERY call) vs plan-once/execute-many (`queryExecution.toRdd`
  * kept across measurements, like a real cluster job that plans once), and
  * reports gate-style paired 1-vs-4-core engine efficiencies both ways.
  * The pipeline under test is graft.Bench.kgJob itself, so the probe measures
  * exactly what the gate measures. */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val pagesN = if (args.nonEmpty) args(0).toLong else 50000L
    val rounds = if (args.length > 1) args(1).toInt else 6
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-gate-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tmp = java.nio.file.Files.createTempDirectory("graft-probe").toString
    val pagesPath = s"$tmp/pages"
    graft.gen.PageGen.pages(pagesN, 42L, 64, sentsMin = 15, sentsMax = 40)(spark)
      .write.mode("overwrite").parquet(pagesPath)

    // warm everything
    graft.Bench.kgJob(spark, pagesPath, 32).count()
    graft.Bench.kgJob(spark, pagesPath, 32).count()

    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // 1) fixed overhead of a fresh count(): tiny input, 32 cores — wall is
    //    almost pure planning + scheduling
    val tinyPath = s"$tmp/tiny"
    graft.gen.PageGen.pages(200L, 7L, 64, 15, 40)(spark)
      .write.mode("overwrite").parquet(tinyPath)
    graft.Bench.kgJob(spark, tinyPath, 32).count() // warm
    val freshCounts = (1 to 5).map(_ => t(graft.Bench.kgJob(spark, tinyPath, 32).count()))
    val tinyRdd = graft.Bench.kgJob(spark, tinyPath, 32).queryExecution.toRdd
    tinyRdd.count() // warm
    val rddCounts = (1 to 5).map(_ => t(tinyRdd.count()))
    println(f"fresh-count overhead (tiny input, s): ${freshCounts.mkString(", ")}")
    println(f"plan-once rdd.count (tiny input, s):  ${rddCounts.mkString(", ")}")

    // 2) gate-style rounds both ways
    val rdd1 = graft.Bench.kgJob(spark, pagesPath, 1).queryExecution.toRdd
    val rdd4 = graft.Bench.kgJob(spark, pagesPath, 4).queryExecution.toRdd
    rdd4.count() // warm
    println("round, e1_fresh, e4_fresh, eff_fresh, e1_rdd, e4_rdd, eff_rdd")
    (1 to rounds).foreach { r =>
      val e1f = pagesN / t(graft.Bench.kgJob(spark, pagesPath, 1).count())
      val e4f = pagesN / t(graft.Bench.kgJob(spark, pagesPath, 4).count())
      val e1r = pagesN / t(rdd1.count())
      val e4r = pagesN / t(rdd4.count())
      println(f"$r, ${e1f}%.0f, ${e4f}%.0f, ${(e4f / e1f) / 4}%.3f, ${e1r}%.0f, ${e4r}%.0f, ${(e4r / e1r) / 4}%.3f")
    }
    spark.stop()
  }
}
