package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** Engine-side invariants for the round-4 provenance/sketch/readability/
  * resize batch (the cross-engine oracle checks hash parity over the
  * fixture corpus; these pin the unit semantics on hand-built tables). */
class ProvenanceSketchSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("edgeProvenance: argmax doc by (mentions DESC, doc_id ASC) + totals") {
    // edge X: doc 2 asserts twice, docs 1 and 5 once each -> top 2
    // edge Y: docs 3 and 4 once each (tie) -> smaller doc id 3 wins
    val mentions = Seq(
      ("a", "b", "pos", 2L), ("a", "b", "pos", 2L), ("a", "b", "pos", 1L),
      ("a", "b", "pos", 5L),
      ("c", "d", "neg", 4L), ("c", "d", "neg", 3L)
    ).toDF("source", "target", "sent", "doc_id")
    val out = graft.graph.GraphBuilder.edgeProvenance(mentions)
      .orderBy("source").collect()
    assert(out.length == 2)
    val x = out(0)
    assert(x.getAs[Long]("top_doc") == 2L && x.getAs[Long]("top_doc_mentions") == 2L)
    assert(x.getAs[Long]("n_mentions") == 4L && x.getAs[Long]("n_docs") == 3L)
    val y = out(1)
    assert(y.getAs[Long]("top_doc") == 3L && y.getAs[Long]("top_doc_mentions") == 1L)
    assert(y.getAs[Long]("n_mentions") == 2L && y.getAs[Long]("n_docs") == 2L)
  }

  test("bottomKJaccard: identical member sets estimate 1000 permille") {
    val df = (0 until 20).flatMap(i => Seq(("g1", s"k$i"), ("g2", s"k$i")))
      .toDF("g", "k")
    val out = Sketches.bottomKJaccard(df, col("g"), col("k"), k = 8).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("est_jaccard_permille") == 1000L)
    assert(out(0).getAs[Long]("n_shared") == 8L)
  }

  test("bottomKJaccard: disjoint sets never form a candidate pair") {
    val df = ((0 until 20).map(i => ("g1", s"a$i")) ++
      (0 until 20).map(i => ("g2", s"b$i"))).toDF("g", "k")
    assert(Sketches.bottomKJaccard(df, col("g"), col("k"), k = 8).count() == 0L)
  }

  test("bottomKJaccard: estimate within the k-bounded grid and deterministic") {
    // half-overlapping sets: estimate must land on a multiple of 1000/k
    // inside (0, 1000) and be identical across runs (pure hash arithmetic)
    val df = ((0 until 30).map(i => ("g1", s"x$i")) ++
      (15 until 45).map(i => ("g2", s"x$i"))).toDF("g", "k")
    val r1 = Sketches.bottomKJaccard(df, col("g"), col("k"), k = 8).collect()
    val r2 = Sketches.bottomKJaccard(df, col("g"), col("k"), k = 8).collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq)
    if (r1.nonEmpty) {
      val est = r1(0).getAs[Long]("est_jaccard_permille")
      assert(est > 0L && est < 1000L && est % (1000L / 8L) == 0L)
    }
  }

  test("readability: exact-integer Flesch terms on a crafted text") {
    // "the cat sat. a big elephant arrived!" -> 7 words, 3 sentences
    // (2 terminal runs + 1), syllables = vowel groups, 2 long words
    val df = Seq((1L, "the cat sat. a big elephant arrived!")).toDF("doc_id", "text")
    val r = TextStats.readability(df, col("text"), col("doc_id")).collect()(0)
    assert(r.getAs[Long]("n_words") == 7L)
    assert(r.getAs[Long]("n_sents") == 3L)
    // e, a, a, a, i, e-e-a (3 groups in elephant), a-i-e (3 in arrived) = 11
    assert(r.getAs[Long]("n_syllables") == 11L)
    assert(r.getAs[Long]("n_long_words") == 2L) // "elephant" "arrived!"
    assert(r.getAs[Long]("flesch_x1000") ==
      206835L - (1015L * 7L) / 3L - (84600L * 11L) / 7L)
    assert(r.getAs[Long]("long_word_permille") == 2000L / 7L)
  }

  test("readability drops zero-word rows, never divides by zero") {
    val df = Seq((1L, "one two"), (2L, "word")).toDF("doc_id", "text")
    assert(TextStats.readability(df, col("text"), col("doc_id")).count() == 2L)
  }

  test("degreeGini: even degrees score 0, a hub raises the coefficient") {
    val even = Seq(("a", "b", 1.0)).toDF("source", "target", "c")
    val e = graft.graph.GraphOps.degreeGini(even).collect()(0)
    assert(e.getAs[Long]("gini_permille") == 0L)
    // degrees a=4, b=3, c=1 -> s = 1*1 + 2*3 + 3*4 = 19;
    // (2000*19) div (3*8) = 1583; (1000*4) div 3 = 1333 -> 250
    val skew = Seq(("a", "b", 3.0), ("a", "c", 1.0)).toDF("source", "target", "c")
    val s = graft.graph.GraphOps.degreeGini(skew).collect()(0)
    assert(s.getAs[Long]("n_nodes") == 3L && s.getAs[Long]("total_degree") == 8L)
    assert(s.getAs[Long]("gini_permille") == 250L)
  }

  test("resizePlan: max edge bounded, aspect ratio preserved, no upscale") {
    val df = Seq((1, 1024, 512), (2, 100, 50)).toDF("id", "w", "h")
      .select(col("id"), struct(col("w").as("width"), col("h").as("height")).as("meta"))
    val out = Multimodal.resizePlan(df, "meta", maxEdge = 256)
      .orderBy("id").collect()
    assert(out(0).getAs[Int]("target_width") == 256 &&
      out(0).getAs[Int]("target_height") == 128)
    // already under the edge: untouched
    assert(out(1).getAs[Int]("target_width") == 100 &&
      out(1).getAs[Int]("target_height") == 50)
  }
}
