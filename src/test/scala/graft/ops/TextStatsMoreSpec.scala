package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.graph.GraphBuilder
import org.apache.spark.sql.functions._

/** tfIdfTopK, histogramQuantiles, and the mergeable edge-state family. */
class TextStatsMoreSpec extends AnyFunSuite with SparkTestSession {

  test("linearClassifier: default weight seam scores hashed unigrams+bigrams exactly") {
    import spark.implicits._
    // md5-bucket weights, hand-derived: x->620, y->815, "x y"->-630 (sum
    // 805, keep); z->-990 (drop)
    val df = Seq((1L, "x y"), (2L, "z")).toDF("doc_id", "text")
    val got = TextStats.linearClassifier(df, col("text"), col("doc_id")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(1L -> (3L, 805L, 1L), 2L -> (1L, -990L, 0L)))
  }

  test("linearClassifier: a passed weight table overrides the seam; unseen buckets weigh 0") {
    import spark.implicits._
    val df = Seq((1L, "x y"), (2L, "z")).toDF("doc_id", "text")
    // weight only x's bucket (3); y (96), "x y" (433), z (877) fall to 0
    val w = Seq((3L, 7L)).toDF("b", "w")
    val got = TextStats.linearClassifier(df, col("text"), col("doc_id"),
        weights = Some(w)).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(1L -> (7L, 1L), 2L -> (0L, 1L)))
  }

  test("tfIdfTopK: hand-computed integer idf and deterministic ranks") {
    import spark.implicits._
    val df = Seq((1L, "apple banana apple"), (2L, "banana cherry")).toDF("doc_id", "text")
    val got = TextStats.tfIdfTopK(df, col("text"), col("doc_id"), k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // n_docs = 2, ilog2(2) = 1; idf: apple/cherry (df=1) -> 1, banana (df=2) -> 0
    assert(got((1L, 1L)) == (("apple", 2L, 1L, 2L)))
    assert(got((1L, 2L)) == (("banana", 1L, 2L, 0L)))
    assert(got((2L, 1L)) == (("cherry", 1L, 1L, 1L)))
    assert(got((2L, 2L)) == (("banana", 1L, 2L, 0L)))
  }

  test("c4Rules: line keep/drop cases, doc flags, and the rebuilt clean text") {
    import spark.implicits._
    val good = "This line has enough words right here.\nAnother proper sentence ends well too!"
    val docs = Seq(
      (1L, good),
      (2L, "Too short.\nno terminal punctuation here at all\nEnable javascript to view this page.\nOne fine line that does qualify nicely."),
      (3L, "Lorem ipsum dolor sit amet consectetur adipiscing elit.\nA second proper sentence sits right here.\nA third proper sentence closes the document."),
      (4L, "function f() { return 1; } is code in prose and it still ends properly.\nA second proper sentence sits right here.\nA third proper sentence closes the document.")
    ).toDF("doc_id", "text")
    val got = TextStats.c4Rules(docs, col("text"), col("doc_id"), minWordsPerLine = 5, minLinesKept = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getString(6))).toMap
    // doc 1: both lines survive, keep
    assert(got(1L) == (2L, 2L, false, false, true, good))
    // doc 2: short line, unterminated line, javascript line all drop; 1 < minLinesKept
    assert(got(2L)._2 == 1L && !got(2L)._5)
    assert(got(2L)._6 == "One fine line that does qualify nicely.")
    // doc 3: lines fine but lorem ipsum flags the whole doc
    assert(got(3L)._3 && !got(3L)._5 && got(3L)._2 == 3L)
    // doc 4: brace flag kills it even though lines qualify
    assert(got(4L)._4 && !got(4L)._5)
  }

  test("gopherRules: each rule trips on its targeted fixture; a clean doc keeps") {
    import spark.implicits._
    val cleanWords = (1 to 60).map(i => if (i % 5 == 0) "the" else s"word$i")
    val docs = Seq(
      (1L, cleanWords.mkString(" ")),                          // passes everything
      (2L, (1 to 10).map(_ => "word").mkString(" ")),          // too few words
      (3L, (1 to 60).map(_ => "ab").mkString(" ")),            // mean word len 2 < 3
      (4L, cleanWords.mkString(" ") + " ##########"),          // 10 symbols vs 61 words
      (5L, (1 to 60).map(i => s"$i").mkString(" ")),           // numeric: alpha frac 0
      (6L, (1 to 8).map(_ => "- bullet line here").mkString("\n"))) // all bullets
      .toDF("doc_id", "text")
    val got = TextStats.gopherRules(docs, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(9)).toMap
    assert(got(1L))
    assert(!got(2L) && !got(3L) && !got(4L) && !got(5L) && !got(6L))
  }

  test("piiScrub: emails, IPs and phones become typed tokens with audit counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "write to a.user+tag@example.co.uk or ops@host.io today"),
      (2L, "server 10.0.12.9 and backup 192.168.1.1 are up"),
      (3L, "call +1 415-555-0100 now"),
      (4L, "clean text with no identifiers at all")).toDF("doc_id", "text")
    val got = TextStats.piiScrub(docs, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got(1L) == (2L, 0L, 0L, "write to <EMAIL> or <EMAIL> today"))
    assert(got(2L) == (0L, 2L, 0L, "server <IP> and backup <IP> are up"))
    assert(got(3L) == (0L, 0L, 1L, "call <PHONE> now"))
    assert(got(4L) == (0L, 0L, 0L, "clean text with no identifiers at all"))
  }

  test("histogramQuantiles: exact rank selection on 1..10") {
    import spark.implicits._
    val df = (1L to 10L).toDF("v")
    val got = TextStats.histogramQuantiles(df, col("v"), Seq(0.0, 0.5, 0.9, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    // target rank = floor(q*(n-1)) + 1 over n=10 values
    assert(got(0.0) == 1L && got(0.5) == 5L && got(0.9) == 9L && got(1.0) == 10L)
  }

  test("histogramQuantiles: duplicates collapse into the histogram correctly") {
    import spark.implicits._
    val df = (Seq.fill(9)(1L) ++ Seq(100L)).toDF("v") // p50 in the duplicate mass
    val got = TextStats.histogramQuantiles(df, col("v"), Seq(0.5, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(got(0.5) == 1L && got(1.0) == 100L)
  }

  test("edge state merge: batch-boundary edges survive where per-batch HAVING would drop them") {
    import spark.implicits._
    // the same edge appears once per batch; minLinks=2 requires the counts to
    // merge BEFORE filtering
    val a = Seq(("A", "B", "pos"), ("C", "D", "neg")).toDF("source", "target", "sent")
    val b = Seq(("A", "B", "pos")).toDF("source", "target", "sent")
    val merged = GraphBuilder.edgesFromState(
      GraphBuilder.mergeEdgeState(GraphBuilder.edgeState(a), GraphBuilder.edgeState(b)),
      minLinks = 2)
    val full = GraphBuilder.edges(a.unionByName(b), minLinks = 2)
    assert(merged.collect().map(_.toSeq).toSet == full.collect().map(_.toSeq).toSet)
    assert(merged.count() == 1) // only (A,B,pos) reaches 2
    // per-batch filtering would have emitted nothing
    val wrong = GraphBuilder.mergeEdgeState(
      GraphBuilder.edges(a, minLinks = 2).withColumnRenamed("c", "cnt"),
      GraphBuilder.edges(b, minLinks = 2).withColumnRenamed("c", "cnt"))
    assert(wrong.count() == 0)
  }

  test("edge state merge is order-insensitive (associative/commutative)") {
    import spark.implicits._
    val batches = Seq(
      Seq(("A", "B", "pos"), ("A", "B", "pos")),
      Seq(("A", "B", "pos"), ("X", "Y", "neg")),
      Seq(("X", "Y", "neg")))
      .map(_.toDF("source", "target", "sent")).map(GraphBuilder.edgeState)
    val fwd = batches.reduce(GraphBuilder.mergeEdgeState)
    val rev = batches.reverse.reduce(GraphBuilder.mergeEdgeState)
    assert(fwd.collect().map(_.toSeq).toSet == rev.collect().map(_.toSeq).toSet)
  }
}
