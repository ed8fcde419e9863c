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

  test("cardsFromRelations: counts, degree, top co-mention; zero-degree entities keep a card") {
    import org.apache.spark.sql.functions.col
    val m = Seq(
      (1L, 0, "spark", "ORG"), (1L, 3, "spark", "ORG"), (2L, 1, "spark", "ORG"),
      (1L, 5, "table", "LOC"), (2L, 7, "stream", "GPE"))
      .toDF("doc_id", "term_index", "value", "type")
    // edges: spark->table twice the weight of spark->stream; stream isolated
    // from table so GPE.stream's only neighbor is spark
    val e = Seq(
      ("ORG.spark", "LOC.table", "pos", 4.0), ("ORG.spark", "GPE.stream", "neg", 2.0))
      .toDF("source", "target", "sent", "c")
    val got = graft.ops.DocKg.cardsFromRelations(m, e).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))).toMap
    assert(got == Map(
      "ORG.spark" -> (3L, 2L, 2L, 6L, "LOC.table"), // top co = heavier edge
      "LOC.table" -> (1L, 1L, 1L, 4L, "ORG.spark"),
      "GPE.stream" -> (1L, 1L, 1L, 2L, "ORG.spark")))
    // a mentioned entity with no qualifying edge keeps a zero-degree card
    val m2 = m.union(Seq((3L, 0, "customer", "PERSON")).toDF("doc_id", "term_index", "value", "type"))
    val g2 = graft.ops.DocKg.cardsFromRelations(m2, e).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getString(5))).toMap
    assert(g2("PERSON.customer") == (0L, ""))
  }

  test("salienceFromMentions: rank by mentions desc, then earliest, then value") {
    import org.apache.spark.sql.functions.col
    val m = Seq(
      (1L, 5, "spark", "ORG"), (1L, 9, "spark", "ORG"), (1L, 2, "table", "LOC"),
      (1L, 20, "stream", "GPE"),
      (2L, 0, "customer", "PERSON"))
      .toDF("doc_id", "term_index", "value", "type")
    val got = graft.ops.DocKg.salienceFromMentions(m)
      .select(col("doc_id"), col("value"), col("n_mentions"), col("first_pos"),
        col("spread"), col("salience_rank"))
      .as[(Long, String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, "spark", 2L, 5L, 4L, 1L),   // most mentions wins
      (1L, "table", 1L, 2L, 0L, 2L),   // tie on mentions -> earliest first
      (1L, "stream", 1L, 20L, 0L, 3L),
      (2L, "customer", 1L, 0L, 0L, 1L)))
  }

  test("edgeDecay: exact halving per half-life, future clamp, age cap") {
    val now = 1700000000L + 28L * 86400L
    val obs = Seq(
      ("a", "b", "pos", now),                    // age 0 -> 1000000
      ("a", "b", "pos", now - 7L * 86400L),      // 1 half-life -> 500000
      ("a", "b", "pos", now - 14L * 86400L),     // 2 -> 250000
      ("a", "b", "pos", now + 999L),             // future clamps to age 0
      ("c", "d", "neg", now - 400L * 86400L))    // past the cap -> 1e6 >> 20 = 0
      .toDF("source", "target", "sent", "ts_epoch")
    val got = GraphBuilder.edgeDecay(obs, now, halfLifeDays = 7, maxBuckets = 20)
      .as[(String, String, String, Long, Long)].collect().toSet
    assert(got === Set(
      ("a", "b", "pos", 4L, 1000000L + 500000L + 250000L + 1000000L),
      ("c", "d", "neg", 1L, 0L)))
  }

  test("schemaProfile: per-signature triple and endpoint counts") {
    val t = Seq(
      ("spark", "ORG", "pos", "table", "LOC"),
      ("spark", "ORG", "pos", "stream", "LOC"),
      ("flink", "ORG", "pos", "table", "LOC"),
      ("spark", "ORG", "neg", "table", "LOC"))
      .toDF("subj", "subj_type", "pred", "obj", "obj_type")
    val got = GraphBuilder.schemaProfile(t)
      .as[(String, String, String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("ORG", "pos", "LOC", 3L, 2L, 2L),
      ("ORG", "neg", "LOC", 1L, 1L, 1L)))
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
