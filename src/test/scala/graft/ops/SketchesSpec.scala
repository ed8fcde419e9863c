package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** HLL register and count-min sketch semantics: determinism, bounded state,
  * mergeability, and the estimator guarantees (estimate error bound for HLL;
  * never-under-count for CMS) against exact answers on synthetic corpora. */
class SketchesSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val docs = (0 until 5000)
    .map(i => (i.toLong, s"doc number ${i % 3000}")) // 3000 distinct texts
    .toDF("doc_id", "text")

  test("hllRegisters: bounded state, deterministic, partition-invariant") {
    val a = Sketches.hllRegisters(docs, col("text")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a.size <= 256 && a.keys.forall(k => k >= 0 && k < 256))
    assert(a.values.forall(v => v >= 1 && v <= 61))
    val b = Sketches.hllRegisters(docs.repartition(13), col("text")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
  }

  test("hllRegisters: shard sketches merge by register max to the full sketch") {
    val left = Sketches.hllRegisters(docs.filter(col("doc_id") < 2500), col("text"))
    val right = Sketches.hllRegisters(docs.filter(col("doc_id") >= 2500), col("text"))
    val merged = left.union(right)
      .groupBy(col("register")).agg(max(col("max_rho")).as("max_rho"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val full = Sketches.hllRegisters(docs, col("text")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(merged == full)
  }

  test("hllEstimate: within the p=8 error envelope of the exact distinct count") {
    val est = Sketches.hllEstimate(Sketches.hllRegisters(docs, col("text")), p = 8)
    // standard error at m=256 is ~6.5%; allow 3 sigma
    assert(math.abs(est - 3000.0) / 3000.0 < 0.20, s"estimate $est vs exact 3000")
  }

  test("hllEstimate: small-range correction keeps tiny cardinalities honest") {
    val tiny = (0 until 10).map(i => s"only $i").toDF("text")
    val est = Sketches.hllEstimate(Sketches.hllRegisters(tiny, col("text")), p = 8)
    assert(est > 5.0 && est < 15.0, s"estimate $est vs exact 10")
  }

  test("cmsSketch: bounded cells; total mass per row equals the corpus size") {
    val keyed = (0 until 1000).map(i => s"k${i % 7}").toDF("k")
    val sk = Sketches.cmsSketch(keyed, col("k"), depth = 4, width = 64)
    val rows = sk.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length <= 4 * 64)
    val perRow = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(perRow == Map(0L -> 1000L, 1L -> 1000L, 2L -> 1000L, 3L -> 1000L))
  }

  test("cmsEstimate: never under-counts; exact when a key collides nowhere") {
    // skewed corpus: k0 appears 600x, k1..k20 appear 20x each
    val keyed = ((0 until 600).map(_ => "k0") ++
      (1 to 20).flatMap(j => (0 until 20).map(_ => s"k$j"))).toDF("k")
    val exact = keyed.groupBy(col("k")).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val sk = Sketches.cmsSketch(keyed, col("k"), depth = 4, width = 64)
    val est = Sketches.cmsEstimate(sk, keyed, col("k"), depth = 4, width = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, c) => assert(est(k) >= c, s"$k: est ${est(k)} < exact $c") }
    // the heavy hitter dominates every cell it lands in: estimate is exact-ish
    assert(est("k0") >= 600L && est("k0") <= 640L)
  }

  test("bloomBits: bounded, deterministic, shards merge by union") {
    val bits = Sketches.bloomBits(docs, col("text"), m = 1024, k = 4)
      .collect().map(_.getLong(0)).toSet
    assert(bits.forall(p => p >= 0 && p < 1024))
    val merged = Sketches.bloomBits(docs.filter(col("doc_id") < 2500), col("text"), m = 1024, k = 4)
      .union(Sketches.bloomBits(docs.filter(col("doc_id") >= 2500), col("text"), m = 1024, k = 4))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(merged == bits)
  }

  test("bloomProbe: zero false negatives; misses are definite; FP rate sane") {
    // build over the 3000 distinct member texts, probe members + non-members
    val bits = Sketches.bloomBits(docs, col("text"), m = 1 << 16, k = 4)
    val probes = ((0 until 3000).map(i => (i.toLong, s"doc number $i")) ++ // members
      (0 until 1000).map(i => (10000L + i, s"absent text $i"))) // non-members
      .toDF("pid", "text")
    val got = Sketches.bloomProbe(bits, probes, col("text"), col("pid"), m = 1 << 16, k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 4000)
    // the Bloom contract: every member hits (no false negatives)
    assert((0 until 3000).forall(i => got(i.toLong) == 1L))
    // non-members: overwhelmingly 0; the deterministic FP count is small
    val fps = (0 until 1000).count(i => got(10000L + i) == 1L)
    assert(fps < 20, s"false positives: $fps / 1000")
  }

  test("bloomProbe: fails fast on out-of-range positions (wrong m)") {
    val bits = Sketches.bloomBits(docs, col("text"), m = 4096, k = 3)
    val ex = intercept[IllegalArgumentException] {
      Sketches.bloomProbe(bits, docs, col("text"), col("doc_id"), m = 64, k = 3).collect()
    }
    assert(ex.getMessage.contains("filter's own m"))
  }
}
