package graft.graph

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class EdgeRollupSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // one edge asserted 3x from one host's two docs + 1x from another host;
  // a second edge asserted once; a null-sent row must drop (F4 semantics)
  private val obs = Seq(
    ("ORG.spark", "LOC.table", "pos", 1L, "h1.test", 1700000000L),
    ("ORG.spark", "LOC.table", "pos", 1L, "h1.test", 1700000000L),
    ("ORG.spark", "LOC.table", "pos", 2L, "h1.test", 1700086400L),
    ("ORG.spark", "LOC.table", "pos", 3L, "h2.test", 1700000600L),
    ("GPE.stream", "LOC.table", "neg", 4L, "h3.test", 1700172800L),
    (null, "LOC.table", "neg", 5L, "h3.test", 1700172800L))
    .toDF("source", "target", "sent", "doc_id", "host", "ts_epoch")

  test("edgeEvidence: mention vs doc vs host support separate correctly") {
    val got = GraphBuilder.edgeEvidence(obs)
      .as[(String, String, String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("ORG.spark", "LOC.table", "pos", 4L, 3L, 2L),
      ("GPE.stream", "LOC.table", "neg", 1L, 1L, 1L)))
  }

  test("edgeHistory: first/last epoch and distinct active days") {
    val got = GraphBuilder.edgeHistory(obs)
      .as[(String, String, String, Long, Long, Long, Long)].collect().toSet
    // 1700000000 and 1700000600 share a UTC day; 1700086400 is the next
    assert(got === Set(
      ("ORG.spark", "LOC.table", "pos", 4L, 1700000000L, 1700086400L, 2L),
      ("GPE.stream", "LOC.table", "neg", 1L, 1700172800L, 1700172800L, 1L)))
  }
}
