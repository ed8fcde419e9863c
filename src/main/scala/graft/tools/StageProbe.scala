package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-stage cost probe: parse-only vs full pipeline. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 60000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val s: SparkSession = spark
    import s.implicits._
    val cfg = graft.kg.KgPipeline.Config(
      sampler = graft.kg.Sampler.Config(renderText = false))
    def pages = graft.gen.PageGen.pages(n, 7L, 128, 15, 40)
    def gen = pages.map(p => p.text.length.toLong)
    def parsed = graft.kg.KgPipeline.parsePages(pages, graft.ner.BracketNer, cfg)
      .map(_.sentences.length.toLong)
    def full = graft.kg.KgPipeline.triplesFast(
      graft.kg.KgPipeline.parsePages(pages, graft.ner.BracketNer, cfg), cfg,
      graft.kg.LexiconScorer())
    def time(label: String)(f: => Long): Unit = {
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val c = f; (System.nanoTime() - t0) / 1e9
      }.min match { case sec => println(f"[stage] $label%-10s ${n / sec}%.0f docs/s (best of 3)") }
    }
    full.count() // warm
    time("gen")(gen.reduce(_ + _))
    time("parse")(parsed.reduce(_ + _))
    time("full")(full.count())
    spark.stop()
  }
}
