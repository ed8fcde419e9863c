package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-6 measurement probe for the supply-KG query family: times the
  * shared typedSupplyTriples derivation (lazy count, checkpoint
  * materialization) and the stats-planned BGP chain variants, best-of-k.
  * Pure diagnostics — no query path goes through this. */
object SupplyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = if (args.length > 0) args(0).toInt else 4
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-supply-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def best(label: String)(work: => Any): Unit = {
      work // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); work; (System.nanoTime() - t0) / 1e9
      }
      println(f"[supply] $label best=${ts.min}%.3f reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    import graft.ops.{Bgp, DocKg}
    best("typed.count")(DocKg.typedSupplyTriples(spark, sfDir).count())
    best("typed.checkpoint") {
      val df = DocKg.typedSupplyTriples(spark, sfDir).select("s", "p", "o").localCheckpoint()
      df.unpersist()
    }
    best("typed.checkpoint+count") {
      val df = DocKg.typedSupplyTriples(spark, sfDir).select("s", "p", "o").localCheckpoint()
      df.count(); df.unpersist()
    }
    val pats = Seq(
      Bgp.Pat("?c", "placed", "?ord"),
      Bgp.Pat("?ord", "contains", "?pt"),
      Bgp.Pat("?pt", "supplied_by", "?sup"))
    best("planned_stats.current") {
      val rel = DocKg.typedSupplyTriples(spark, sfDir).select("s", "p", "o").localCheckpoint()
      val n = Bgp.matchPatterns(rel, Bgp.planPatternsStats(rel, pats),
        distinctInput = true).count()
      rel.unpersist(); n
    }
    best("planned_stats.lazy-rel") {
      // stats scan + binds over the LAZY relation: per-pattern p=const
      // filters constant-fold 4 of 5 union branches away, so each bind is
      // one narrow parquet scan + distinct instead of a checkpoint read
      val rel = DocKg.typedSupplyTriples(spark, sfDir).select("s", "p", "o")
      Bgp.matchPatterns(rel, Bgp.planPatternsStats(rel, pats),
        distinctInput = true).count()
    }
    best("path_inverse.current") {
      Bgp.matchPatterns(DocKg.typedSupplyTriples(spark, sfDir).select("s", "p", "o"),
        Seq(Bgp.Pat("?pt", "^contains", "?ord"),
          Bgp.Pat("?pt", "supplied_by", "?sup")), distinctInput = true).count()
    }
    spark.stop()
  }
}
