package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-session A/B of Bgp.reachability's hopsPerAction (1 = the round-4
  * per-hop-action shape, 4 = the chunked shape) over the kg_reachability
  * query's exact relation. `runMain graft.tools.ReachProbe [reps]`. */
object ReachProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-reachprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rel = graft.ops.DocKg.typedSupplyTriples(spark, sfDir)
      .select("s", "p", "o").localCheckpoint(true) // shared prep, excluded
    def run(hpa: Int): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = graft.ops.Bgp.reachability(rel,
        Seq("contains", "supplied_by", "located_in"),
        seeds = Seq("O0", "O1", "O2"), hopsPerAction = hpa).count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    run(1); run(4) // warm both shapes
    val best = collection.mutable.Map[Int, Double]().withDefaultValue(Double.MaxValue)
    var rows = Map[Int, Long]()
    for (_ <- 1 to reps; h <- Seq(1, 4)) {
      val (n, dt) = run(h)
      best(h) = math.min(best(h), dt)
      rows += h -> n
      println(f"reachprobe-run hpa=$h $dt%.2f")
    }
    println(f"reachprobe rows=${rows(1)}/${rows(4)} hpa1=${best(1)}%.2f hpa4=${best(4)}%.2f")
    spark.stop()
  }
}
