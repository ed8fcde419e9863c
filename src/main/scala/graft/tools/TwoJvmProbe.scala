package graft.tools

import org.apache.spark.sql.SparkSession

/** The LITERAL two-cluster-size run the scaling rule names: one fresh JVM
  * per parallelism level (`local[N]`), SAME pages parquet, SAME job
  * ([[graft.Bench.kgJob]] — the fused pages→triples pipeline), so the two
  * throughputs come from genuinely separate "clusters" rather than
  * partition-limited runs inside one session. Alongside the engine job each
  * JVM times the two hardware controls (pure-CPU LCG spins and the 4 KB
  * memory-streaming loop) at the same level, so an inter-JVM efficiency
  * below 1.0 can be attributed: if the CONTROLS decay the same way, the
  * limiter is the shared box (one memory controller / host CPU steal), not
  * engine structure — the property a real 4N-executor cluster would not
  * share, since executors multiply bandwidth with cores.
  *
  *   runMain graft.tools.TwoJvmProbe <pagesParquet> <cores> [reps]
  *
  * Prints one line:
  *   twojvm cores=N docs_per_sec=… lcg_rows_per_sec=… mem_rows_per_sec=…
  * Drive it once per level (e.g. 8 then 32) and divide: eff = (tp32/tp8)/4.
  */
object TwoJvmProbe {
  def main(args: Array[String]): Unit = {
    val pagesPath = args(0)
    val cores = args(1).toInt
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cores]").appName(s"graft-twojvm-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // first JVM generates the shared input deterministically; later levels
    // reuse the same files (identical bytes -> identical work per level)
    if (!new java.io.File(pagesPath).exists()) {
      graft.gen.PageGen.pages(50000L, 43L, 64, sentsMin = 15, sentsMax = 40)(spark)
        .write.mode("overwrite").parquet(pagesPath)
    }
    val nPages = spark.read.parquet(pagesPath).count()
    val rdd = graft.Bench.kgJob(spark, pagesPath, cores).queryExecution.toRdd
    def lcg(rows: Long): Long = spark.range(0, rows, 1, cores).map { i =>
      var h = i; var k = 0
      while (k < 2000) { h = h * 6364136223846793005L + 1442695040888963407L; k += 1 }
      h & 1L
    }.reduce(_ + _)
    def mem(rows: Long): Long = spark.range(0, rows, 1, cores).map { i =>
      val buf = new Array[Byte](4096)
      var k = 0
      while (k < buf.length) { buf(k) = ((i + k) & 0xff).toByte; k += 1 }
      var acc = 0L; k = 0
      while (k < buf.length) { acc += buf(k); k += 8 }
      acc
    }.reduce(_ + _)
    val lcgRows = 2000000L * cores
    val memRows = 200000L * cores
    // warm everything (JIT, codegen, page cache) before any timed rep
    rdd.count(); lcg(lcgRows); mem(memRows)
    def tp(work: => Unit, units: Long): Double = {
      val t0 = System.nanoTime(); work; units / ((System.nanoTime() - t0) / 1e9)
    }
    var (bestE, bestL, bestM) = (0.0, 0.0, 0.0)
    for (_ <- 1 to reps) {
      bestE = math.max(bestE, tp(rdd.count(), nPages))
      bestL = math.max(bestL, tp(lcg(lcgRows), lcgRows))
      bestM = math.max(bestM, tp(mem(memRows), memRows))
    }
    println(f"twojvm cores=$cores docs_per_sec=$bestE%.1f lcg_rows_per_sec=$bestL%.1f mem_rows_per_sec=$bestM%.1f")
    spark.stop()
  }
}
