package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** DSIR importance weights, cross-set LSH decontamination, and the crawl
  * change-rate schedule — hand-computed fixtures (cross-engine oracles pin
  * the corpus-scale behavior). */
class DsirChangeRateSpec extends AnyFunSuite with SparkTestSession {

  test("dsirWeights: target-exclusive tokens score 0, off-target tokens negative") {
    import spark.implicits._
    // 4 target docs of 'alpha alpha alpha', 4 raw-only docs of 'beta beta beta'
    val df = ((0L until 4L).map(i => (i, "alpha alpha alpha", true)) ++
      (4L until 8L).map(i => (i, "beta beta beta", false))).toDF("id", "text", "is_t")
    val w = TextStats.dsirWeights(df, col("text"), col("id"), col("is_t"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // alpha bucket: c_raw = c_tgt = 12 -> lr = ilog2(13) - ilog2(13) = 0
    // beta bucket:  c_raw = 12, c_tgt = 0 -> lr = ilog2(1) - ilog2(13) = -3
    (0L until 4L).foreach(i => assert(w(i) == ((0L, 3L))))
    (4L until 8L).foreach(i => assert(w(i) == ((-9L, 3L))))
  }

  test("dsirWeights: identical docs get identical weights regardless of partitioning") {
    import spark.implicits._
    val df = (0L until 20L).map(i =>
      (i, if (i % 2 == 0) "the quick fox" else "der schnelle fuchs", i % 2 == 0))
      .toDF("id", "text", "is_t").repartition(7)
    val w = TextStats.dsirWeights(df, col("text"), col("id"), col("is_t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((2L until 20L by 2).forall(i => w(i) == w(0L)))
    assert((3L until 20L by 2).forall(i => w(i) == w(1L)))
    // the target-side docs must outscore the off-target docs
    assert(w(0L) > w(1L))
  }

  test("lshCosineJoin: planted duplicate found, disjoint vectors not joined") {
    import spark.implicits._
    val dim = 8
    val base = Array.tabulate(dim)(i => 1.0 / (i + 1))
    val ortho = Array.tabulate(dim)(i => if (i % 2 == 0) 1.0 else -1.5)
    val corpus = Seq((100L, base.toSeq), (101L, ortho.toSeq)).toDF("id", "v")
    val evals = Seq((1L, base.toSeq)).toDF("id", "v")
    val got = Similarity.lshCosineJoin(corpus, evals, col("id"), col("v"),
      threshold = 0.9, dim = dim)
    // equi-joins only — a corpus x eval cross join would be a scale bug
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"), plan)
    val rows = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(t => (t._1, t._2)).toSet == Set((100L, 1L)))
    assert(rows.head._3 > 0.999)
  }

  test("lshCosineJoin: maxBucketSize drops degenerate corpus buckets") {
    import spark.implicits._
    val dim = 8
    val v = Array.tabulate(dim)(i => 1.0 / (i + 1))
    // 5 identical corpus vectors -> every band bucket holds 5 ids
    val corpus = (0L until 5L).map(i => (i, v.toSeq)).toDF("id", "v")
    val evals = Seq((99L, v.toSeq)).toDF("id", "v")
    val all = Similarity.lshCosineJoin(corpus, evals, col("id"), col("v"),
      threshold = 0.9, dim = dim).count()
    val capped = Similarity.lshCosineJoin(corpus, evals, col("id"), col("v"),
      threshold = 0.9, dim = dim, maxBucketSize = 4).count()
    assert(all == 5L && capped == 0L)
  }

  test("changeRate: per-host churn and the revisit interpolation") {
    import spark.implicits._
    val prev = Seq(
      ("https://h1.test/a", "one"), ("https://h1.test/b", "two"),
      ("https://h2.test/a", "same"), ("https://h3.test/only-prev", "gone"))
      .toDF("url", "text")
    val cur = Seq(
      ("https://h1.test/a", "one CHANGED"), ("https://h1.test/b", "two"),
      ("https://h2.test/a", "same"), ("https://h4.test/only-cur", "new"))
      .toDF("url", "text")
    val got = WebGraph.changeRate(prev, cur).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // h3/h4 appear in only one snapshot -> not part of the re-fetched set
    assert(got.keySet == Set("h1.test", "h2.test"))
    assert(got("h1.test") == ((2L, 1L, 500000L, 87L))) // 168 - 162 div 2
    assert(got("h2.test") == ((1L, 0L, 0L, 168L)))
  }

  test("changeRate: fully churning host hits the 6h floor") {
    import spark.implicits._
    val prev = Seq(("https://hot.test/x", "a")).toDF("url", "text")
    val cur = Seq(("https://hot.test/x", "b")).toDF("url", "text")
    val got = WebGraph.changeRate(prev, cur).collect().head
    assert(got.getLong(3) == 1000000L && got.getLong(4) == 6L)
  }
}
