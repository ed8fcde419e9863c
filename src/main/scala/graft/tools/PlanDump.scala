package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a list of SparkEntry queries to files:
  *   runMain graft.tools.PlanDump <outDir> <suffix> <name1,name2,...>
  * writes <outDir>/<name>_<suffix>.txt per query — the round's plan-evidence
  * artifact (plans/r06/<q>_before.txt / _after.txt). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      val nEx = "Exchange".r.findAllIn(plan).length
      println(s"plandump $name exchanges=$nEx bytes=${plan.length}")
    }
    spark.stop()
  }
}
