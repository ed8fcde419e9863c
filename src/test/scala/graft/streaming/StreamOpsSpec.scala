package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.core.Page
import graft.gen.PageGen
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)

class StreamOpsSpec extends AnyFunSuite with SparkTestSession {

  private def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)

  test("streaming triples == batch triples on the same pages (stateless row-local)") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val pages = (0L until 20L).map(i => PageGen.page(42L, i))
    val mem = MemoryStream[Page]
    mem.addData(pages)
    val cfg = graft.kg.KgPipeline.Config()
    val q = StreamOps.triplesStream(mem.toDS(), graft.ner.BracketNer, cfg, graft.kg.LexiconScorer())(spark)
      .writeStream.format("memory").queryName("triples_stream").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("triples_stream").collect().map(_.toString).sorted.toSeq

    val batch = graft.kg.KgPipeline.triples(
      graft.kg.KgPipeline.samples(
        graft.kg.KgPipeline.parsePages(pages.toDS(), graft.ner.BracketNer, cfg)(spark), cfg)(spark),
      graft.kg.LexiconScorer())(spark).toDF().collect().map(_.toString).sorted.toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("fused streaming triples == fused batch triples (zero-token-allocation kernel)") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val pages = (0L until 20L).map(i => PageGen.page(42L, i))
    val mem = MemoryStream[Page]
    mem.addData(pages)
    val cfg = graft.kg.KgPipeline.Config(
      sampler = graft.kg.Sampler.Config(renderText = false))
    val q = StreamOps.triplesStreamFused(mem.toDS(), cfg, graft.kg.LexiconScorer())(spark)
      .writeStream.format("memory").queryName("triples_fused_stream").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("triples_fused_stream").collect().map(_.toString).sorted.toSeq
    val batch = graft.kg.KgPipeline
      .triplesFused(pages.toDS(), cfg, graft.kg.LexiconScorer())(spark)
      .toDF().collect().map(_.toString).sorted.toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming N-Triples == batch RDF formatting of the same triples") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val pages = (0L until 15L).map(i => PageGen.page(7L, i))
    val mem = MemoryStream[Page]
    mem.addData(pages)
    val cfg = graft.kg.KgPipeline.Config(
      sampler = graft.kg.Sampler.Config(renderText = false))
    val q = StreamOps.ntriplesStream(
        StreamOps.triplesStreamFused(mem.toDS(), cfg, graft.kg.LexiconScorer())(spark))
      .writeStream.format("memory").queryName("nt_stream").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("nt_stream").collect().map(_.getString(0)).sorted.toSeq
    val batch = StreamOps.ntriplesStream(
        graft.kg.KgPipeline.triplesFused(pages.toDS(), cfg, graft.kg.LexiconScorer())(spark))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(streamed == batch && streamed.nonEmpty)
    val grammar = """^<[^<>"\s{}|^`\\]+> <[^<>"\s{}|^`\\]+> <[^<>"\s{}|^`\\]+> \.$""".r
    streamed.foreach(l => assert(grammar.findFirstIn(l).isDefined, s"bad statement: $l"))
  }

  test("checkpointed restart resumes exactly-once (file sink + checkpointLocation)") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream-ckpt").toString
    val mem = MemoryStream[Page]
    val cfg = graft.kg.KgPipeline.Config()
    def start() = StreamOps
      .triplesStream(mem.toDS(), graft.ner.BracketNer, cfg, graft.kg.LexiconScorer())(spark)
      .writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()

    val batch1 = (0L until 10L).map(i => PageGen.page(42L, i))
    val batch2 = (10L until 20L).map(i => PageGen.page(42L, i))
    mem.addData(batch1)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    val afterBatch1 = spark.read.parquet(s"$dir/out").count()
    mem.addData(batch2)
    val q2 = start(); q2.processAllAvailable(); q2.stop() // restart from checkpoint
    val streamed = spark.read.parquet(s"$dir/out")
      .select("sampleId").collect().map(_.getString(0)).sorted.toSeq

    val batchAll = graft.kg.KgPipeline.triples(
      graft.kg.KgPipeline.samples(
        graft.kg.KgPipeline.parsePages((batch1 ++ batch2).toDS(), graft.ner.BracketNer, cfg)(spark),
        cfg)(spark), graft.kg.LexiconScorer())(spark)
      .select("sampleId").collect().map(_.getString(0)).sorted.toSeq
    assert(streamed == batchAll, "no loss, no duplication across restart")
    assert(afterBatch1 < streamed.size)
  }

  test("watermarked hourly windows aggregate the events stream") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(Seq(
      Ev(1, ts(0), 1, "click", 1.0), Ev(2, ts(10), 1, "click", 2.0),
      Ev(3, ts(65), 2, "view", 3.0), Ev(4, ts(70), 2, "click", 4.0)))
    val q = StreamOps.eventsHourly(mem.toDF())
      .writeStream.format("memory").queryName("hourly").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("hourly")
      .select("event_type", "n_events", "sum_value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(rows == Seq(("click", 1L, 4.0), ("click", 2L, 3.0), ("view", 1L, 3.0)))
  }

  test("streaming edge aggregation: windowed (source,target,sent) counts with node keys") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    // (subj, subjType, pred, obj, objType, ts)
    val mem = MemoryStream[(String, String, String, String, String, java.sql.Timestamp)]
    mem.addData(Seq(
      ("usa", "GPE", "pos", "eu", "ORG", ts(0)),
      ("usa", "GPE", "pos", "eu", "ORG", ts(5)),
      ("usa.", "GPE", "neg", "e.u", "ORG", ts(10)), // P16 cleaning: trailing dot / dot mask
      ("usa", "GPE", "pos", "eu", "ORG", ts(70)))) // next window
    val q = StreamOps.edgesStream(
        mem.toDF().toDF("subj", "subjType", "pred", "obj", "objType", "crawl_ts"), "crawl_ts")
      .writeStream.format("memory").queryName("edges_stream").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("edges_stream")
      .select("source", "target", "sent", "c").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3))).sorted.toSeq
    assert(rows == Seq(
      ("GPE.usa", "ORG.eu", "pos", 1.0),  // second window
      ("GPE.usa", "ORG.eu", "pos", 2.0),  // first window
      ("GPE.usa", "ORG.e·u", "neg", 1.0)).sorted)
  }

  test("streaming exact dedup keeps first doc per content hash across micro-batches") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = StreamOps.dedupExactStream(
        mem.toDF().toDF("doc_id", "crawl_ts", "text"), "text", "crawl_ts")
      .writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    mem.addData(Seq(
      (1L, ts(0), "alpha beta"), (2L, ts(1), "gamma"), (3L, ts(2), "alpha beta")))
    q.processAllAvailable()
    mem.addData(Seq( // duplicate arriving in a LATER micro-batch is still dropped
      (4L, ts(3), "alpha beta"), (5L, ts(4), "delta")))
    q.processAllAvailable(); q.stop()
    val ids = spark.table("dedup_stream").select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 5L))
  }

  test("watermarked minhash stream: candidate pairs inside the horizon == batch candidates") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val docs = Seq(
      (1L, ts(0), "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, ts(5), "one two three four five six seven eight nine ten"),
      (3L, ts(10), "alpha beta gamma delta epsilon zeta eta theta iota NEARBY"), // near dup of 1
      (4L, ts(15), "one two three four five six seven eight nine ten"),          // exact dup of 2
      (5L, ts(20), "totally different content about catalyst optimizer rules"))
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = StreamOps.dedupMinhashStream(
        mem.toDF().toDF("doc_id", "crawl_ts", "text"), "text", "doc_id", "crawl_ts",
        watermark = "1 hour", horizon = "1 hour",
        bands = 8, shingleW = 2, rowsPerBand = 1)
      .writeStream.format("memory").queryName("minhash_stream").outputMode("append").start()
    mem.addData(docs.take(3))
    q.processAllAvailable()
    mem.addData(docs.drop(3)) // candidates must still form across micro-batches
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("minhash_stream").select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // all docs lie within one horizon: parity with the batch candidate set
    val batch = graft.ops.Dedup.minhashCandidates(
      graft.ops.Dedup.minhashSignatures(
        docs.toDF("doc_id", "crawl_ts", "text"), col("text"), col("doc_id"),
        bands = 8, shingleW = 2, rowsPerBand = 1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch, s"streamed $streamed vs batch $batch")
    assert(batch.contains((1L, 3L)) && batch.contains((2L, 4L)))
  }

  test("store-backed ingest dedup: near-dups dropped across micro-batches, unbounded horizon") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.dedupIngestStream(
      mem.toDF().toDF("doc_id", "text"), "text", "doc_id",
      s"$dir/store", s"$dir/out", s"$dir/ckpt",
      params = graft.ops.SigStore.Params(bands = 8, shingleW = 2, rowsPerBand = 1))
    mem.addData(Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"))) // in-batch exact dup
    q.processAllAvailable()
    mem.addData(Seq(
      (4L, "one two three four five six seven eight"),        // exact dup of history
      (5L, "alpha beta gamma delta epsilon zeta eta EXTRA"),  // near dup of history
      (6L, "completely fresh words about catalyst planning")))
    q.processAllAvailable(); q.stop()
    val ids = spark.read.parquet(s"$dir/out").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 6L), s"got $ids")
  }

  test("streaming HLL ingest: store registers == batch sketch of the full history") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-hll-ingest").toString
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.hllIngestStream(
      mem.toDF().toDF("doc_id", "text"), "text", s"$dir/store", s"$dir/ckpt")
    val batch1 = (0 until 400).map(i => (i.toLong, s"page number ${i % 300}"))
    val batch2 = (400 until 700).map(i => (i.toLong, s"page number ${i % 500}"))
    mem.addData(batch1); q.processAllAvailable()
    mem.addData(batch2); q.processAllAvailable(); q.stop()
    val stored = graft.ops.Sketches.readRegisterStore(spark, s"$dir/store")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val full = graft.ops.Sketches.hllRegisters(
      (batch1 ++ batch2).toDF("doc_id", "text"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(stored == full, "idempotent max-merge must equal the one-shot batch sketch")
    // and the estimate off the STORE tracks the true distinct count:
    // batch1 texts are {0..299}, batch2 texts are {400..499} ∪ {0..199} -> 400
    val est = graft.ops.Sketches.hllEstimate(
      graft.ops.Sketches.readRegisterStore(spark, s"$dir/store"))
    assert(math.abs(est - 400.0) / 400.0 < 0.20, s"estimate $est vs exact 400")
  }

  test("HLL register store: crash mid-swap recovers; replay is a no-op") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-hll-store").toString
    val docs = (0 until 200).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
    val regs = graft.ops.Sketches.hllRegisters(docs, col("text"))
    graft.ops.Sketches.mergeRegistersIntoStore(regs, s"$dir/store")
    val before = graft.ops.Sketches.readRegisterStore(spark, s"$dir/store")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // simulate a crash between the two swap renames: current gone, bak present
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/store/registers"),
      new org.apache.hadoop.fs.Path(s"$dir/store/registers.bak"))
    val recovered = graft.ops.Sketches.readRegisterStore(spark, s"$dir/store")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(recovered == before, "read after crash must restore from .bak")
    // replaying the SAME batch leaves the store unchanged (max-merge idempotence)
    graft.ops.Sketches.mergeRegistersIntoStore(regs, s"$dir/store")
    val after = graft.ops.Sketches.readRegisterStore(spark, s"$dir/store")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(after == before)
    // precision is pinned: a merge under a different p fails fast instead of
    // silently max-merging incompatible register spaces
    assert(graft.ops.Sketches.storeP(spark, s"$dir/store").contains(8))
    val regs12 = graft.ops.Sketches.hllRegisters(docs, col("text"), p = 12)
    val err = intercept[IllegalArgumentException] {
      graft.ops.Sketches.mergeRegistersIntoStore(regs12, s"$dir/store", p = 12)
    }
    assert(err.getMessage.contains("created with p=8"))
  }

  test("session_window sessionizes with 30-minute gaps") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(Seq(
      Ev(1, ts(0), 1, "click", 0), Ev(2, ts(10), 1, "click", 0), // session 1 (2 events)
      Ev(3, ts(120), 1, "click", 0),                             // session 2
      Ev(4, ts(5), 2, "view", 0)))                               // user 2, one session
    val q = StreamOps.eventsSessions(mem.toDF())
      .writeStream.format("memory").queryName("sessions").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("sessions").select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(rows == Seq((1L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("streaming edge ingest folds micro-batch counts into the EdgeStore exactly once") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("graft-edge-ingest").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-edge-ingest-ckpt").toString
    val mem = MemoryStream[(String, String, Int)]
    val q = StreamOps.edgeIngestStream(
      mem.toDF().toDF("source", "target", "sent"), store, ckpt, batchPrefix = "t")
    mem.addData(Seq(("A", "B", 0), ("C", "D", 1)))
    q.processAllAvailable()
    mem.addData(Seq(("A", "B", 0), ("A", "B", 1)))
    q.processAllAvailable(); q.stop()
    // counts span micro-batches; min-links applies at read
    val e2 = graft.ops.EdgeStore.edges(spark, store, minLinks = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getDouble(3))).toSet
    assert(e2 == Set(("A", "B", 0, 2.0)))
    assert(graft.ops.EdgeStore.edges(spark, store).count() == 3)
    // epoch-derived batch ids landed in the ledger (the exactly-once token)
    val ledger = graft.ops.EdgeStore.mergedBatches(spark, store)
    assert(ledger.forall(_.startsWith("t-")) && ledger.size == 2, s"ledger $ledger")
  }

  test("streaming link ingest: crawl micro-batches maintain the host graph in the EdgeStore") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("graft-link-ingest").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-link-ingest-ckpt").toString
    def page(url: String, hrefs: (String, String)*): (String, Array[Byte]) =
      (url, hrefs.map { case (h, a) => s"""<a href="$h">$a</a>""" }
        .mkString("<html><body>", "", "</body></html>").getBytes("UTF-8"))
    val mem = MemoryStream[(String, Array[Byte])]
    val q = StreamOps.linkIngestStream(
      mem.toDF().toDF("url", "html"), store, ckpt, batchPrefix = "w")
    mem.addData(Seq(
      page("https://a.test/1", "https://b.test/x" -> "to b", "/local" -> "self"),
      page("https://c.test/1", "https://b.test/y" -> "to b")))
    q.processAllAvailable()
    mem.addData(Seq(page("https://a.test/2", "https://b.test/z" -> "again")))
    q.processAllAvailable(); q.stop()
    val got = graft.ops.EdgeStore.edges(spark, store).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3))).toSet
    // counts accumulate ACROSS micro-batches (a.test->b.test spans both);
    // the root-relative href lands as a same-host self-edge
    assert(got == Set(
      ("a.test", "b.test", "href", 2.0),
      ("a.test", "a.test", "href", 1.0),
      ("c.test", "b.test", "href", 1.0)), got)
    // the continuously-maintained graph feeds authority directly
    val ranks = graft.graph.GraphOps.pageRank(
      graft.ops.EdgeStore.edges(spark, store), iters = 2)
    assert(ranks.count() == 3)
  }

  test("continuous authority loop: stream ingest -> EdgeStore -> warm-started PageRank resume") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("graft-auth-store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-auth-ckpt").toString
    val rdir = java.nio.file.Files.createTempDirectory("graft-auth-ranks").toString
    def page(url: String, hrefs: (String, String)*): (String, Array[Byte]) =
      (url, hrefs.map { case (h, a) => s"""<a href="$h">$a</a>""" }
        .mkString("<html><body>", "", "</body></html>").getBytes("UTF-8"))
    val mem = MemoryStream[(String, Array[Byte])]
    val q = StreamOps.linkIngestStream(
      mem.toDF().toDF("url", "html"), store, ckpt, batchPrefix = "w")
    // crawl cadence 1: two hosts linking b.test
    mem.addData(Seq(
      page("https://a.test/1", "https://b.test/x" -> "b"),
      page("https://c.test/1", "https://b.test/y" -> "b")))
    q.processAllAvailable()
    // analytics cadence 1: ranks over the store so far (cold start)
    val mid = graft.graph.RankStore.advance(
      graft.ops.EdgeStore.edges(spark, store), rdir, iters = 1)
    assert(mid.count() == 3) // a, b, c hosts
    // crawl cadence 2: a NEW host appears and b links back out
    mem.addData(Seq(
      page("https://d.test/1", "https://b.test/z" -> "b"),
      page("https://b.test/x", "https://a.test/2" -> "a")))
    q.processAllAvailable(); q.stop()
    // analytics cadence 2: warm-start resume over the grown graph — new
    // node d starts at the uniform share, everyone else from stored ranks
    val e = graft.ops.EdgeStore.edges(spark, store)
    val resumed = graft.graph.RankStore.advance(e, rdir, iters = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows(resumed).map(_._1) == Seq("a.test", "b.test", "c.test", "d.test"))
    // and once the graph is stable, the resume contract is exact: two more
    // cadences over the SAME union graph == one batch pageRank(4+2... ) split
    val r3 = graft.graph.RankStore.advance(e, rdir, iters = 1)
    val batch = {
      // what a from-scratch batch job over the final graph computes with the
      // same total post-growth budget, warm-started identically
      val warm = graft.graph.GraphOps.pageRankResume(e, mid, iters = 2)
      graft.graph.GraphOps.pageRankResume(e, warm, iters = 1)
    }
    assert(rows(r3) == rows(batch)) // stream-then-resume == batch on the union
  }

  test("streaming frontier ingest: store-backed frontier == batch frontier over all links") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("graft-frontier-ingest").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-frontier-ckpt").toString
    def page(url: String, hrefs: (String, String)*): (String, Array[Byte]) =
      (url, hrefs.map { case (h, a) => s"""<a href="$h">$a</a>""" }
        .mkString("<html><body>", "", "</body></html>").getBytes("UTF-8"))
    val batch1 = Seq(
      page("https://a.test/1", "https://new.test/x" -> "nx", "https://new.test/y" -> "ny"),
      page("https://b.test/1", "https://new.test/x" -> "nx"))
    val batch2 = Seq(
      page("https://a.test/2", "https://new.test/y" -> "ny", "https://new.test/z" -> "nz",
        "https://old.test/seen" -> "s"))
    val mem = MemoryStream[(String, Array[Byte])]
    val q = StreamOps.frontierIngestStream(
      mem.toDF().toDF("url", "html"), store, ckpt, batchPrefix = "f")
    mem.addData(batch1); q.processAllAvailable()
    mem.addData(batch2); q.processAllAvailable(); q.stop()
    val crawled = Seq("https://old.test/seen").toDF("url")
    val fromStore = graft.ops.WebGraph.frontierFromStore(spark, store, crawled, perHost = 2)
      .as[(String, Long, Long, Long)].collect().toSet
    // the batch answer over ALL links at once must match the accreted store
    val allPages = (batch1 ++ batch2).toDF("url", "html")
    val batchAnswer = graft.ops.WebGraph.frontier(
      graft.ops.WebGraph.extractLinks(allPages, col("html"), col("url")),
      crawled, perHost = 2).as[(String, Long, Long, Long)].collect().toSet
    assert(fromStore === batchAnswer)
    assert(fromStore === Set(
      ("https://new.test/x", 2L, 2L, 1L),   // 2 links, 2 hosts
      ("https://new.test/y", 2L, 1L, 2L)))  // 2 links, 1 host; z cut by cap
  }

  test("streaming fp ingest: store-backed mirror report == batch report over all pages") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("graft-fp-ingest").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-fp-ckpt").toString
    val batch1 = Seq(
      ("https://m1.test/a", "same wire story"),
      ("https://m1.test/b", "unique to m1"),
      ("https://m2.test/x", "same wire story"))
    val batch2 = Seq(
      ("https://m2.test/y", "second shared piece"),
      ("https://m1.test/c", "second shared piece"),
      ("https://m1.test/a2", "same wire story"), // same host+text again: compacts
      ("https://m3.test/solo", "nothing shared"))
    val mem = MemoryStream[(String, String)]
    val q = StreamOps.fpIngestStream(
      mem.toDF().toDF("url", "text"), store, ckpt, batchPrefix = "fp")
    mem.addData(batch1); q.processAllAvailable()
    mem.addData(batch2); q.processAllAvailable(); q.stop()
    val fromStore = graft.ops.WebGraph.mirrorHostsFromStore(spark, store, minShared = 2L)
      .as[(String, String, Long, Long, Long)].collect().toSet
    val allPages = (batch1 ++ batch2).toDF("url", "text")
    val batchAnswer = graft.ops.WebGraph.mirrorHosts(allPages,
        graft.ops.UrlOps.hostOf(col("url")), md5(col("text").cast("binary")),
        minShared = 2L)
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(fromStore === batchAnswer)
    // m1/m2 share both the wire story and the second piece; m1 has 3
    // distinct fps (a/a2 compacted in the store), m2 has 2; m3 shares nothing
    assert(fromStore === Set(("m1.test", "m2.test", 2L, 3L, 2L)))
  }

  test("vec ingest stream: micro-batches fold into the CentroidStore exactly once") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("graft-vec-ingest").toString + "/cs"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-vec-ingest-ckpt").toString
    val dim = 8
    // seed: two constant blobs (values 1 and 11) -> trained centroids exactly those
    val seed = (0 until 10).flatMap(j => Seq(
      (j.toLong, Seq.fill(dim)(1.0)), (100L + j, Seq.fill(dim)(11.0))))
      .toDF("vec_id", "embedding")
    graft.ops.CentroidStore.init(seed, col("vec_id"), col("embedding"), store,
      graft.ops.CentroidStore.Params(k = 2, dim = dim, scale = 1000))
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = StreamOps.vecIngestStream(mem.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", store, ckpt, batchPrefix = "v")
    mem.addData(Seq((200L, Seq.fill(dim)(3.0)), (201L, Seq.fill(dim)(3.0))))
    q.processAllAvailable()
    mem.addData(Seq((202L, Seq.fill(dim)(13.0))))
    q.processAllAvailable(); q.stop()
    // blob-1 cell: prior 1 + 10 seed + 2 stream of 3000 -> floor(17000/13)
    val cents = graft.ops.CentroidStore.centroids(spark, store)
    val cell1 = graft.ops.CentroidStore.assign(
      Seq((999L, Seq.fill(dim)(1.0))).toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding"), store).head().getLong(1).toInt
    assert(cents(cell1).forall(_ == (11L * 1000 + 2 * 3000) / 13))
    assert(cents(1 - cell1).forall(_ == (11L * 11000 + 13000) / 12))
    // two epochs in the ledger, each folded once
    val ledger = graft.ops.CentroidStore.mergedBatches(spark, store)
    assert(ledger.count(_.startsWith("v-")) == 2, s"ledger $ledger")
  }

  test("stanceDriftStream: edge-triggered flip alerts across micro-batches") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val mem = MemoryStream[(String, String, String, Long)]
    val q = StreamOps.stanceDriftStream(
      mem.toDF().toDF("source", "target", "sent", "ts_epoch"))(spark)
      .writeStream.format("memory").queryName("drift_stream").outputMode("append").start()
    // batch 1: two pos observations -> aligned, no event
    mem.addData(Seq(("P", "Q", "pos", 100L), ("P", "Q", "pos", 200L)))
    q.processAllAvailable()
    assert(spark.table("drift_stream").count() == 0)
    // batch 2: a late neg -> ENTERS drift (dominant pos, latest neg): 1 event;
    // a second neg in the same batch re-aligns (2-2 tie -> dominant neg =
    // latest neg), so still exactly one event for the pair
    mem.addData(Seq(("P", "Q", "neg", 300L), ("P", "Q", "neg", 400L)))
    q.processAllAvailable()
    // batch 3: stable pair X->Y never fires
    mem.addData(Seq(("X", "Y", "pos", 10L), ("X", "Y", "pos", 20L)))
    q.processAllAvailable(); q.stop()
    val got = spark.table("drift_stream").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3), r.getString(4), r.getLong(5)))
    assert(got.toSeq == Seq(("P", "Q", 300L, "pos", "neg", 3L)))
  }

  test("sessionsWithState: gap closes a session, cap closes a session, state stays bounded") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = StreamOps.sessionsWithState(
      mem.toDF().toDF("user_id", "ts", "value"), gapMinutes = 30, maxEvents = 3)(spark)
      .writeStream.format("memory").queryName("state_sessions").outputMode("append").start()
    // user 1: two events 10 min apart, then one 90 min later -> gap closure
    mem.addData(Seq((1L, ts(0), 1.0), (1L, ts(10), 2.0)))
    q.processAllAvailable()
    mem.addData(Seq((1L, ts(100), 5.0)))
    q.processAllAvailable()
    // user 2: three events inside the gap -> cap closure at maxEvents=3
    mem.addData(Seq((2L, ts(100), 1.0), (2L, ts(101), 1.0), (2L, ts(102), 1.0)))
    q.processAllAvailable(); q.stop()
    val got = spark.table("state_sessions")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(4), r.getString(5))).toSet
    assert(got == Set(
      (1L, 2L, 3.0, "gap"),  // the first 2-event session, closed by the 90-min jump
      (2L, 3L, 3.0, "cap"))) // user 2 capped at 3 events
  }

  test("warc pages stream: segment files landing in a dir == batch warc read; " +
      "fused triples flow") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-stream").toString
    val orig = (0L until 6L).map(i => PageGen.page(11L, i))
    def seg(name: String, ps: Seq[Page]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
        graft.sources.Warc.writeGz(ps.map(p =>
          graft.sources.Warc.responseRecord(p.url, p.warc_ts, p.html))))
    seg("seg-0.warc.gz", orig.take(3))
    val q = StreamOps.warcPagesStream(dir)(spark)
      .writeStream.format("memory").queryName("warc_pages").outputMode("append").start()
    q.processAllAvailable()
    seg("seg-1.warc.gz", orig.drop(3)) // second segment lands mid-stream
    q.processAllAvailable(); q.stop()
    val got = spark.table("warc_pages").as[Page].collect().sortBy(_.url)
    assert(got.map(_.url).toSeq == orig.map(_.url).sorted)
    assert(got.map(_.text).toSeq == orig.sortBy(_.url).map(_.text)) // byte-identical extraction
    // the stream composes with the fused KG kernel: triples from the warc
    // pages stream equal the batch kernel's on the same pages
    val mem = MemoryStream[Page]
    val cfg = graft.kg.KgPipeline.Config(
      sampler = graft.kg.Sampler.Config(renderText = false))
    val q2 = StreamOps.triplesStreamFused(mem.toDS(), cfg, graft.kg.LexiconScorer())(spark)
      .writeStream.format("memory").queryName("warc_triples").outputMode("append").start()
    mem.addData(got.toSeq)
    q2.processAllAvailable(); q2.stop()
    val streamed = spark.table("warc_triples").count()
    val batch = graft.kg.KgPipeline.triplesFused(orig.toDS(), cfg, graft.kg.LexiconScorer()).count()
    assert(streamed == batch && batch > 0)
  }

  test("changelogStream: liveness flips emit once; stale entries are absorbed") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val mem = MemoryStream[(String, String, String, Long, String)]
    val q = StreamOps.changelogStream(
      mem.toDF().toDF("s", "p", "o", "ts", "op"))(spark)
      .writeStream.format("memory").queryName("live_stream").outputMode("append").start()
    // batch 1: add a (live), lone del for b (no flip: never live)
    mem.addData(Seq(("a", "r", "x", 10L, "add"), ("b", "r", "y", 10L, "del")))
    q.processAllAvailable()
    // batch 2: retract a; duplicate/late add@5 for a must be absorbed
    mem.addData(Seq(("a", "r", "x", 20L, "del"), ("a", "r", "x", 5L, "add")))
    q.processAllAvailable()
    // batch 3: re-add a (live again); same-ts add/del tie for c -> del wins, no flip
    mem.addData(Seq(("a", "r", "x", 30L, "add"),
      ("c", "r", "z", 30L, "add"), ("c", "r", "z", 30L, "del")))
    q.processAllAvailable(); q.stop()
    val got = spark.table("live_stream").collect()
      .map(r => (r.getString(0), r.getBoolean(3), r.getLong(4))).toSeq
    assert(got == Seq(("a", true, 10L), ("a", false, 20L), ("a", true, 30L)))
  }

  test("changelogIngestStream: micro-batches land exactly-once in the persistent store") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("clog-ingest").toString + "/store"
    val ckpt = java.nio.file.Files.createTempDirectory("clog-ckpt").toString
    val mem = MemoryStream[(String, String, String, Long, String)]
    val q = StreamOps.changelogIngestStream(
      mem.toDF().toDF("s", "p", "o", "ts", "op"), store, ckpt, "t")(spark)
    mem.addData(Seq(("a", "r", "x", 10L, "add"), ("b", "r", "y", 10L, "add")))
    q.processAllAvailable()
    mem.addData(Seq(("a", "r", "x", 20L, "del")))
    q.processAllAvailable(); q.stop()
    assert(graft.ops.ChangelogStore.snapshot(spark, store, 15L).collect()
      .map(_.getString(0)).toSet == Set("a", "b"))
    assert(graft.ops.ChangelogStore.snapshot(spark, store, 25L).collect()
      .map(_.getString(0)).toSet == Set("b"))
    assert(graft.ops.ChangelogStore.mergedBatches(spark, store).size == 2)
  }

  test("changelogStream mirror agrees with the batch asOfSnapshot replay") {
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val entries = Seq(
      ("e1", "r", "v", 1L, "add"), ("e1", "r", "v", 4L, "del"),
      ("e2", "r", "v", 2L, "add"), ("e3", "r", "v", 3L, "del"),
      ("e4", "r", "v", 2L, "add"), ("e4", "r", "v", 5L, "add"))
    val mem = MemoryStream[(String, String, String, Long, String)]
    val q = StreamOps.changelogStream(
      mem.toDF().toDF("s", "p", "o", "ts", "op"))(spark)
      .writeStream.format("memory").queryName("live_mirror").outputMode("append").start()
    entries.grouped(2).foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()
    // replay the final liveness from the emitted flips (last flip per key wins)
    val live = spark.table("live_mirror").collect()
      .map(r => (r.getString(0), r.getBoolean(3), r.getLong(4)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._3)._2 }
      .collect { case (k, isLive) if isLive => k }.toSet
    val batch = graft.ops.Changelog.asOfSnapshot(
        entries.toDF("s", "p", "o", "ts", "op"), 99L)
      .collect().map(_.getString(0)).toSet
    assert(live == batch && batch == Set("e2", "e4"))
  }
}
