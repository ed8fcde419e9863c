package graft.tools

import org.apache.spark.sql.SparkSession

/** Control experiment: pure-CPU deterministic work (no NLP, no allocation-heavy
  * pipeline) to separate environment/JVM noise from engine behavior. */
object CpuProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val spark = SparkSession.builder()
      .master("local[32]").appName("cpu-probe")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def job(parts: Int): Long = spark.range(0, n, 1, parts).map { i =>
      var h = i
      var k = 0
      while (k < 2000) { h = h * 6364136223846793005L + 1442695040888963407L; k += 1 }
      h & 1L
    }.reduce(_ + _)
    job(128); job(128) // warm
    Seq(8, 32, 8, 32, 8, 32).foreach { p =>
      val t0 = System.nanoTime()
      job(p)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[cpu] partitions=$p%3d rows/sec=${n / sec}%.0f wall=$sec%.2fs")
    }
    spark.stop()
  }
}
