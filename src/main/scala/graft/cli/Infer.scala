package graft.cli

import org.apache.spark.sql.{SaveMode, SparkSession}
import graft.core.Page
import graft.gen.PageGen
import graft.graph.{D3Json, GraphBuilder}
import graft.kg.{KgPipeline, LexiconScorer, Sampler}
import graft.link.Linker
import graft.ner.{BracketNer, CapitalizedNer}

/** CLI mirroring `python -m arelight.run.infer` (reference
  * arelight/run/infer.py:48-343): pages in -> samples + predictions + triples
  * parquet out + d3js force/radial JSON.
  *
  * Usage:
  *   runMain graft.cli.Infer --synthetic 1000 --out /tmp/out [options]
  *   runMain graft.cli.Infer --pages /path/pages.parquet --out /tmp/out
  *
  * Options: --terms-per-context N (50)  --min-links N (1)  --ner bracket|cap
  *          --name NAME (graph name)    --master local[N]   --synonyms FILE
  */
object Infer {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val out = opts.getOrElse("--out", sys.error("--out required"))
    val master = opts.getOrElse("--master", s"local[${Runtime.getRuntime.availableProcessors}]")

    implicit val spark: SparkSession = SparkSession.builder()
      .master(master)
      .appName("graft-infer")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val pages =
      opts.get("--pages") match {
        case Some(path) => spark.read.parquet(path).as[Page]
        case None       => PageGen.pages(opts.getOrElse("--synthetic", "100").toLong)
      }

    val tpc = opts.getOrElse("--terms-per-context", "50").toInt
    val cfg = KgPipeline.Config(sampler =
      Sampler.Config(termsPerContext = tpc, distInTermsBound = tpc))
    val ner = opts.getOrElse("--ner", "bracket") match {
      case "cap" => CapitalizedNer
      case _     => BracketNer
    }

    val groupId: String => Long = opts.get("--synonyms") match {
      case Some(f) =>
        val dict = Linker.parseSynonyms(scala.io.Source.fromFile(f, "UTF-8").getLines())
        v => dict.getOrElse(graft.text.TextOps.canonicalKey(v), Linker.hashGroupId(v))
      case None => Linker.hashGroupId
    }
    val parsed = KgPipeline.parsePages(pages, ner, cfg, groupId)

    val samples = KgPipeline.samples(parsed, cfg).persist()
    val scorer = LexiconScorer()
    val preds = KgPipeline.predictions(samples, scorer)
    val triples = KgPipeline.triples(samples, scorer)

    KgPipeline.contentsCompat(samples).write.mode(SaveMode.Overwrite).parquet(s"$out/contents")
    KgPipeline.predictionsOneHot(preds).write.mode(SaveMode.Overwrite).parquet(s"$out/predict")
    triples.write.mode(SaveMode.Overwrite).parquet(s"$out/triples")

    // graph build (driver-side finish: edges are post-aggregation small)
    import org.apache.spark.sql.functions._
    val minLinks = opts.getOrElse("--min-links", "1").toDouble
    val name = opts.getOrElse("--name", "pages")
    val t = spark.read.parquet(s"$out/triples")
    val typeMap = t.select(col("subj").as("value"), col("subjType").as("type"))
      .union(t.select(col("obj"), col("objType")))
      .groupBy("value").agg(org.apache.spark.sql.functions.last("type").as("type"))
    val rels = t.select(col("subj").as("source"), col("obj").as("target"), col("pred").as("sent"))
    val edges = GraphBuilder.edges(GraphBuilder.withNodeKeys(rels, typeMap), minLinks)
    val nodes = GraphBuilder.nodes(edges)
    val graph = graft.core.Graph(
      Seq(name), s"[$name]",
      nodes.orderBy("id").collect().map(r =>
        graft.core.GraphNode(r.getString(0), r.getDouble(1))).toSeq,
      edges.orderBy("source", "target", "sent").collect().map(r =>
        graft.core.GraphLink(r.getString(0), r.getString(1), r.getDouble(3), r.getString(2))).toSeq)
    D3Json.save(graph, out, name, intLinkC = true, intNodeC = false)

    val nSamples = samples.count()
    val nTriples = triples.count()
    println(s"""{"pages_out":"$out","samples":$nSamples,"triples":$nTriples,""" +
      s""""nodes":${graph.nodes.size},"links":${graph.links.size}}""")
    spark.stop()
  }
}
