package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: KG pipeline throughput at several parallelism levels, fresh
  * session each, order configurable — for isolating local-mode scaling
  * artifacts (JIT/session-reuse/task-size effects) from true scaling. */
object ScalingProbe {
  def run(cpus: Int, nPages: Long, partitions: Int): Double = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"probe-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      implicit val s: SparkSession = spark
      val cfg = graft.kg.KgPipeline.Config()
      def job(n: Long, parts: Int) = graft.kg.KgPipeline.triples(
        graft.kg.KgPipeline.samples(
          (graft.kg.KgPipeline.parsePages(
            graft.gen.PageGen.pages(n, 7L, parts), graft.ner.BracketNer, cfg)), cfg),
        graft.kg.LexiconScorer())
      job(500, partitions).count() // warm
      val t0 = System.nanoTime()
      job(nPages, partitions).count()
      val sec = (System.nanoTime() - t0) / 1e9
      nPages / sec
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 40000L
    val order = if (args.length > 1) args(1) else "8,32,8,32"
    if (args.length > 2 && args(2) == "onesession") {
      // one local[32] session; vary effective parallelism via input partitions
      val spark = SparkSession.builder()
        .master("local[32]").appName("probe-1s")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      implicit val s: SparkSession = spark
      val sentsMin = sys.env.getOrElse("PROBE_SENTS_MIN", "2").toInt
      val sentsMax = sys.env.getOrElse("PROBE_SENTS_MAX", "6").toInt
      val cfg = graft.kg.KgPipeline.Config(
        sampler = graft.kg.Sampler.Config(renderText = false))
      def job(nn: Long, parts: Int) = graft.kg.KgPipeline.triplesFast(
        graft.kg.KgPipeline.parsePages(
          graft.gen.PageGen.pages(nn, 7L, parts, sentsMin, sentsMax),
          graft.ner.BracketNer, cfg), cfg,
        graft.kg.LexiconScorer())
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val m = i.taskMetrics
          println(f"[stage] id=${i.stageId}%3d tasks=${i.numTasks}%4d " +
            f"wall=${(i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1e3}%8.2fs " +
            f"cpuSum=${m.executorCpuTime / 1e9}%8.2fs runSum=${m.executorRunTime / 1e3}%8.2fs " +
            f"gcSum=${m.jvmGCTime / 1e3}%7.2fs deserSum=${m.executorDeserializeTime / 1e3}%7.2fs")
        }
      })
      job(n, 128).count(); job(n, 128).count() // deep warm
      val best = scala.collection.mutable.Map.empty[Int, Double]
      order.split(",").foreach { spec =>
        val p = spec.trim.toInt
        val t0 = System.nanoTime()
        job(n, p).count()
        val tp = n / ((System.nanoTime() - t0) / 1e9)
        best(p) = math.max(best.getOrElse(p, 0.0), tp)
        println(f"[probe] partitions=$p%3d docs/sec=$tp%.0f")
      }
      best.toSeq.sorted.foreach { case (p, tp) => println(f"[best] partitions=$p%3d docs/sec=$tp%.0f") }
      spark.stop()
    } else {
      order.split(",").foreach { spec =>
        val c = spec.trim.toInt
        val tp = run(c, n, c * 4)
        println(f"[probe] cpus=$c%2d partitions=${c * 4}%3d docs/sec=$tp%.0f")
      }
    }
  }
}
