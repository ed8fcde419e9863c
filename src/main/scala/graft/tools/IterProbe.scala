package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B probe for the iterative-loop materialization policy (GraphOps.roundCkpt
  * conf knobs): times the driver-synchronized graph-family queries under each
  * policy in ONE session (Bench methodology: warm pass, best-of-k,
  * policies interleaved per rep so host noise hits all arms equally).
  *
  *   runMain graft.tools.IterProbe [reps] [query,query,...]
  *
  * Policies:
  *   eager1  — stride 1, eager localCheckpoint/round (round-4 behavior)
  *   eager2F — stride 2, eager, skip final-round ckpt
  *   lazy1F  — stride 1, lazy (plan truncation, no job barrier), skip final
  *   lazy4F  — stride 4, lazy, skip final
  */
object IterProbe {
  val DefaultQueries = Seq("kg_louvain", "kg_louvain_coarse", "kg_community_profile",
    "kg_node2vec", "web_bowtie", "kg_reachability", "kg_view_maintained")

  case class Policy(name: String, stride: Int, eager: Boolean, skipFinal: Boolean)
  val Policies = Seq(
    Policy("eager1", 1, eager = true, skipFinal = false),
    Policy("eager2F", 2, eager = true, skipFinal = true),
    Policy("lazy1F", 1, eager = false, skipFinal = true))
  // NOTE: strides > 2 were probed and are pathological for the multi-consumer
  // loops — louvain's ~5x-per-round plan fanout makes round 4's un-truncated
  // tree ~5^3 copies of round 1's, and single-threaded Catalyst analysis of
  // that tree dwarfs any barrier saving (observed: minutes at load ~1/32).

  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 3
    val queries = if (args.length > 1) args(1).split(",").toSeq else DefaultQueries
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-iterprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def setPolicy(p: Policy): Unit = {
      spark.conf.set("spark.graft.iter.stride", p.stride.toString)
      spark.conf.set("spark.graft.iter.eager", p.eager.toString)
      spark.conf.set("spark.graft.iter.skipFinal", p.skipFinal.toString)
    }

    val best = collection.mutable.Map[(String, String), Double]()
    val rowsSeen = collection.mutable.Map[(String, String), Long]()
    for (q <- queries) {
      val fn = graft.SparkEntry.queries(q)
      // warm once under the baseline policy (codegen/JIT/scan cache)
      setPolicy(Policies.head)
      fn(spark, sfDir).count()
      for (_ <- 1 to reps; p <- Policies) {
        setPolicy(p)
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        val k = (q, p.name)
        best(k) = math.min(best.getOrElse(k, Double.MaxValue), dt)
        rowsSeen(k) = n
        println(f"iterprobe-run $q ${p.name} $dt%.2f"); Console.out.flush()
      }
      val base = rowsSeen((q, "eager1"))
      val diverged = Policies.filter(p => rowsSeen((q, p.name)) != base).map(_.name)
      val times = Policies.map(p => f"${p.name}=${best((q, p.name))}%.2f").mkString(" ")
      println(s"iterprobe $q rows=$base $times" +
        (if (diverged.nonEmpty) s" ROWS-DIVERGED=${diverged.mkString(",")}" else ""))
    }
    spark.stop()
  }
}
