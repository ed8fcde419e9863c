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
