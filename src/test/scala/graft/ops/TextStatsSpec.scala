package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

class TextStatsSpec extends AnyFunSuite with SparkTestSession {

  private def rep(rows: (Long, String)*) = {
    import spark.implicits._
    TextStats.repetition(rows.toDF("doc_id", "text"), col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
  }

  test("tfIdfRetrieve: distinctive query terms rank their source doc first; maxDf stop-lists") {
    import spark.implicits._
    // 'the' appears everywhere (idf weight 0 AND a hot postings key);
    // zebra/quark are distinctive to docs 1 and 2
    val docs = Seq(
      (1L, "the zebra zebra runs"), (2L, "the quark spins"),
      (3L, "the plain filler text"), (4L, "the other filler words"))
      .toDF("doc_id", "text")
    val qs = Seq((10L, "zebra"), (20L, "quark the")).toDF("qid", "qtext")
    val got = TextStats.tfIdfRetrieve(docs, col("text"), col("doc_id"),
      qs, col("qid"), col("qtext"), k = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    // zebra: only doc 1 (tf=2, idf=ilog2(4)-ilog2(1)=2 -> score 4)
    // quark the: doc 2 scores quark (1*2) + the (1*0) = 2; docs 1/3/4 score 0 via 'the'
    assert(got.contains((10L, 1L, 1L, 4L)))
    assert(got.filter(_._1 == 20L).maxBy(r => (-r._2))._3 == 2L)
    assert(got.count(_._1 == 10L) == 1L) // 'zebra' posting has one doc
    // stop-listing: maxDf=3 drops 'the' postings entirely -> query 20 returns only doc 2
    val capped = TextStats.tfIdfRetrieve(docs, col("text"), col("doc_id"),
      qs, col("qid"), col("qtext"), k = 2, maxDf = 3L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(capped.filter(_._1 == 20L).map(_._3) == Set(2L))
  }

  test("repetition: duplicate-line fraction counts repeated lines") {
    val m = rep(
      1L -> "unique one\nunique two\nunique three",
      2L -> "same line\nsame line\nsame line\ndifferent")
    assert(m(1L)._1 == 3L && m(1L)._2 == 0.0)
    assert(m(2L)._1 == 4L)
    assert(math.abs(m(2L)._2 - 0.5) < 1e-12) // 4 lines, 2 distinct -> (4-2)/4
  }

  test("repetition: top-bigram share detects looping text") {
    val m = rep(
      1L -> "spam ham spam ham spam ham spam ham", // bigram "spam ham" dominates
      2L -> "all tokens here are fully distinct words")
    // 7 bigrams; "spam ham" occurs 4x, "ham spam" 3x -> 4/7
    assert(math.abs(m(1L)._3 - 4.0 / 7.0) < 1e-12)
    // distinct text: every bigram occurs once -> 1/n_bigrams
    assert(math.abs(m(2L)._3 - 1.0 / 6.0) < 1e-12)
  }

  test("repetition: degenerate inputs (empty, single token) yield zeros not nulls") {
    val m = rep(1L -> "", 2L -> "single")
    assert(m(1L) == ((1L, 0.0, 0.0))) // split("") -> [""] : one line, no bigrams
    assert(m(2L) == ((1L, 0.0, 0.0)))
  }

  test("repetition plan: map-side only (no shuffle)") {
    import spark.implicits._
    val df = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val plan = TextStats.repetition(df, col("text"), col("doc_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
