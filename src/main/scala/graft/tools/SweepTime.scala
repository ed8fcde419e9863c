package graft.tools

import org.apache.spark.sql.SparkSession

/** Full-registry timing sweep: runs EVERY SparkEntry query against
  * SPARK_GRAFT_SF_DIR in ONE session (warm pass + best-of-reps timed
  * `count()`), printing one `sweep <name> rows=<n> best=<s>` line per query
  * and a final JSON map. Pairs with tools/time_oracle.py (the same queries'
  * DuckDB oracle timings) to produce the per-query engine-vs-single-node
  * table in BASELINE.md.
  *
  * `count()` (not toRdd.count) is used on BOTH engines' side deliberately:
  * the sweep compares end-to-end single-query latency including Catalyst
  * analysis, the regime a user pays for one ad-hoc query. The Bench gate
  * numbers (plan-kept rdd.count) measure the opposite regime; both are
  * labeled in BASELINE.md.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
  * SWEEP_REPS (default 2), SWEEP_ONLY / SWEEP_SKIP (comma-separated names).
  */
object SweepTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SWEEP_REPS", "2").toInt
    val only = sys.env.getOrElse("SWEEP_ONLY", "").split(",").filter(_.nonEmpty).toSet
    val skip = sys.env.getOrElse("SWEEP_SKIP", "").split(",").filter(_.nonEmpty).toSet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-sweep")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => (only.isEmpty || only(n)) && !skip(n))
    val out = scala.collection.mutable.LinkedHashMap[String, Double]()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      try {
        val rows = fn(spark, sfDir).count() // warm: JIT, codegen, file listing
        val best = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }.min
        out(name) = best
        println(f"sweep $name rows=$rows best=$best%.3f")
      } catch {
        case e: Throwable =>
          out(name) = -1.0
          println(s"sweep $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      System.out.flush()
    }
    val js = out.map { case (k, v) => f""""$k":$v%.4f""" }.mkString("{", ",", "}")
    println(s"""SWEEP_JSON $js""")
    spark.stop()
  }
}
