package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B: a deliberately hot-first BGP pattern order vs the same patterns
  * reordered by [[graft.ops.Bgp.planPatternsStats]] over the sf-dir typed
  * supply KG — quantifies what measured-cardinality join ordering buys when
  * shape selectivity ties (all patterns carry one constant). Prints best-of-k
  * wall seconds per variant plus the chosen order. */
object PlanAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = if (args.length > 0) args(0).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-plan-ab")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Bgp
    val rel = graft.ops.DocKg.typedSupplyTriples(spark, sfDir)
      .select("s", "p", "o").localCheckpoint()
    // hot-first: the chain starts from the biggest relation; every pattern
    // has exactly one constant, so the shape planner keeps this order
    val hotFirst = Seq(
      Bgp.Pat("?pt", "supplied_by", "?sup"),
      Bgp.Pat("?ord", "contains", "?pt"),
      Bgp.Pat("?c", "placed", "?ord"))
    val statsOrder = Bgp.planPatternsStats(rel, hotFirst)
    println(s"[plan-ab] stats order: ${statsOrder.map(_.p).mkString(" -> ")}")
    def time(pats: Seq[Bgp.Pat]): (Double, Long) = {
      var rows = 0L
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        rows = Bgp.matchPatterns(rel, pats).count()
        (System.nanoTime() - t0) / 1e9
      }
      (ts.min, rows)
    }
    val (tHot, rHot) = time(hotFirst)
    val (tStats, rStats) = time(statsOrder)
    require(rHot == rStats, s"row mismatch: $rHot vs $rStats")
    println(f"[plan-ab] rows=$rHot hot_first=$tHot%.3f s stats_planned=$tStats%.3f s " +
      f"speedup=${tHot / tStats}%.2fx")
    spark.stop()
  }
}
