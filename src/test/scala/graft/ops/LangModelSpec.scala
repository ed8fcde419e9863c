package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** ops/LangModel: integer-log2 n-gram surprisal scoring (CCNet-shape). All
  * expectations are hand-computed — the scorer is integer-exact by design. */
class LangModelSpec extends AnyFunSuite with SparkTestSession {

  private def score(rows: (Long, String)*) = {
    import spark.implicits._
    LangModel.selfSurprisal(rows.toDF("doc_id", "text"), col("text"), col("doc_id"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
  }

  test("ilog2 is floor(log2) for positive integers") {
    import spark.implicits._
    val got = Seq(1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L).toDF("x")
      .select(LangModel.ilog2(col("x"))).as[Long].collect().toSeq
    assert(got == Seq(0L, 1L, 1L, 2L, 2L, 3L, 9L, 10L))
  }

  test("self-surprisal matches hand-computed counts") {
    // doc1 tokens [a b a b] -> bigrams {a b: 2, b a: 1}
    // doc2 tokens [a b c]   -> bigrams {a b: 1, b c: 1}
    // model: {a b: 3, b a: 1, b c: 1}, N = 5, ilog2(5) = 2
    val m = score(1L -> "a b a b", 2L -> "a b c")
    // doc1: 2*(2 - ilog2(3)=1) + 1*(2 - 0) = 4 over 3 bigrams
    assert(m(1L) == ((3L, 4L, 4.0 / 3.0)))
    // doc2: 1*(2 - 1) + 1*(2 - 0) = 3 over 2 bigrams
    assert(m(2L) == ((2L, 3L, 1.5)))
  }

  test("documents with fewer than two tokens emit no row") {
    val m = score(1L -> "a b", 2L -> "solo", 3L -> "")
    assert(m.keySet == Set(1L))
  }

  test("held-out scoring: unseen bigrams pay the maximal ilog2(N) surprisal") {
    import spark.implicits._
    val train = LangModel.docBigrams(
      Seq((1L, "a b a b a b a b")).toDF("doc_id", "text"),
      col("text"), col("doc_id"))
    val model = LangModel.train(train) // {a b: 4, b a: 3}, N = 7, ilog2(7) = 2
    val held = LangModel.docBigrams(
      Seq((9L, "x y")).toDF("doc_id", "text"), col("text"), col("doc_id"))
    val r = LangModel.surprisal(held, model).collect()
    assert(r.length == 1)
    // one unseen bigram: c -> 1, contribution = ilog2(7) - ilog2(1) = 2
    assert(r(0).getLong(1) == 1L && r(0).getLong(2) == 2L)
  }

  test("rare-bigram documents score strictly higher than repeated-bigram ones") {
    val m = score(
      1L -> "the cat sat on the mat the cat sat on the mat the cat sat on the mat",
      2L -> "zq wv xk jd qb nf lp mg rh ts")
    assert(m(2L)._3 > m(1L)._3,
      s"gibberish ${m(2L)._3} must out-score fluent-repeat ${m(1L)._3}")
  }

  test("phraseMerges: most-frequent pair per round, ties break pair-ascending") {
    import spark.implicits._
    val docs = Seq(
      (0L, "new york city is big"),
      (1L, "new york city is small"),
      (2L, "new york is old"),
      (3L, "tokyo city is big")).toDF("doc_id", "text")
    val m = LangModel.phraseMerges(docs, col("text"), col("doc_id"), k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    // round 1: "city is" and "new york" both count 3 — pair-ascending tie
    assert(m(1L) == (("city", "is", 3L)))
    assert(m(2L) == (("new", "york", 3L)))
    // round 3: "city_is big" vs "new_york city_is" both 2 — 'c' < 'n'
    assert(m(3L) == (("city_is", "big", 2L)))
  }

  test("phraseRewrite: greedy left-to-right within a round; partition-invariant") {
    import spark.implicits._
    val docs = Seq((0L, "a a a"), (1L, "a a a a"), (2L, "b")).toDF("doc_id", "text")
    val got = LangModel.phraseRewrite(docs, col("text"), col("doc_id"), k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(0L -> "a_a a", 1L -> "a_a a_a", 2L -> "b"))
    val again = LangModel.phraseRewrite(docs.repartition(5), col("text"), col("doc_id"), k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == got)
  }
}
