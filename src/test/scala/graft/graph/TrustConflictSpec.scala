package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** TrustRank seed-set semantics, the contradictory-evidence rollup, and
  * time-respecting 2-hop paths. */
class TrustConflictSpec extends AnyFunSuite with SparkTestSession {

  private def edgesDf(edges: Seq[(String, String, Long)]) = {
    import spark.implicits._
    edges.map { case (s, t, c) => (s, t, "pos", c.toDouble) }
      .toDF("source", "target", "sent", "c")
  }

  test("stanceDrift: a late polarity flip is flagged; stable pairs and ts-ties are not") {
    import spark.implicits._
    // P->Q: two early pos, one late neg -> dominant pos, latest neg, DRIFT.
    // P->R: pos twice, later pos again -> stable. X->Y: pos and neg at the
    // SAME max ts -> latest = min label 'neg', dominant (tie 1-1) = 'neg'
    // too -> no drift (both tie-breaks align on the smallest label).
    val obs = Seq(
      ("P", "Q", "pos", 100L), ("P", "Q", "pos", 200L), ("P", "Q", "neg", 300L),
      ("P", "R", "pos", 100L), ("P", "R", "pos", 400L),
      ("X", "Y", "pos", 500L), ("X", "Y", "neg", 500L))
      .toDF("source", "target", "sent", "ts_epoch")
    val got = GraphBuilder.stanceDrift(obs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getString(3), r.getString(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got == Map(
      ("P", "Q") -> (3L, "pos", "neg", 300L, 1L),
      ("P", "R") -> (2L, "pos", "pos", 400L, 0L),
      ("X", "Y") -> (2L, "neg", "neg", 500L, 0L)))
  }

  test("truthDiscovery: majority-aligned providers gain trust, the dissenter loses it") {
    import spark.implicits._
    // claim P->Q: pos by h1,h2, neg by h3; claim P->R: pos by h1,h3.
    // Hand-derived fixed point (scale 1e6, truncating div), 2 rounds:
    // r1 beliefs pos/neg = 666666/333333 -> trust 833333/666666/666666
    // r2 beliefs        = 692307/307692 -> trust 846153/692307/653846
    val votes = Seq(
      ("h1", "P", "Q", "pos"), ("h2", "P", "Q", "pos"), ("h3", "P", "Q", "neg"),
      ("h1", "P", "R", "pos"), ("h3", "P", "R", "pos"))
      .toDF("src", "source", "target", "pred")
    val got = GraphBuilder.truthDiscovery(votes, rounds = 2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      "h1" -> (846153L, 2L, 2L),
      "h2" -> (692307L, 1L, 1L),
      "h3" -> (653846L, 2L, 2L)))
    // trust ranking: the provider agreeing with every weighted majority tops
    assert(got("h1")._1 > got("h2")._1 && got("h2")._1 > got("h3")._1)
  }

  test("truthDiscovery: unanimous providers all converge to full belief") {
    import spark.implicits._
    val votes = Seq(("a", "X", "Y", "pos"), ("b", "X", "Y", "pos"))
      .toDF("src", "source", "target", "pred")
    val got = GraphBuilder.truthDiscovery(votes, rounds = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1000000L, "b" -> 1000000L))
  }

  test("spamMass: the farm target carries full spam mass, the seeded chain none") {
    // same graph as the trustRank case: honest chain s->a->b, farm f*->z
    val e = edgesDf(Seq(
      ("s", "a", 1L), ("a", "b", 1L),
      ("f1", "z", 9L), ("f2", "z", 9L), ("f3", "z", 9L)))
    val got = GraphOps.spamMass(e, col("id") === "s", iters = 3).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // z: big PageRank, zero trust -> spam mass 1000‰
    assert(got("z")._3 == 1000L && got("z")._1 > 0L && got("z")._2 == 0L)
    // the seed holds MORE trust share than rank share -> clamped to 0
    assert(got("s")._3 == 0L && got("s")._2 > got("s")._1)
    // permille vectors are normalized: totals within rounding of 1000
    assert(got.values.map(_._1).sum <= 1000L && got.values.map(_._1).sum >= 990L)
  }

  test("trustRank demotes a spam farm unreachable from the seeds") {
    // honest chain s -> a -> b; spam farm f1,f2,f3 all endorse z heavily.
    // z has the highest in-degree in the graph but no path from the seed.
    val e = edgesDf(Seq(
      ("s", "a", 1L), ("a", "b", 1L),
      ("f1", "z", 9L), ("f2", "z", 9L), ("f3", "z", 9L)))
    val r = GraphOps.trustRank(e, col("id") === "s", iters = 3)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("z") == 0L, s"spam target must score 0, got ${r("z")}")
    assert(r("a") > 0L && r("b") > 0L)
    assert(r("s") > r("a") && r("a") > r("b")) // authority decays down the chain
  }

  test("single-seed trustRank is bit-identical to personalizedPageRank") {
    val e = edgesDf(Seq(
      ("a", "b", 3L), ("a", "c", 1L), ("b", "c", 2L), ("c", "a", 1L)))
    val tr = GraphOps.trustRank(e, col("id") === "a", iters = 3)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val pr = GraphOps.personalizedPageRank(e, "a", iters = 3)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(tr == pr)
  }

  test("mass splits evenly over the seed set; bit-identical under repartitioning") {
    val e = edgesDf(Seq(
      ("a", "c", 1L), ("b", "c", 1L), ("c", "d", 2L), ("d", "a", 1L)))
    val seeds = col("id").isin("a", "b")
    val r1 = GraphOps.trustRank(e.repartition(7), seeds, iters = 2)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val r2 = GraphOps.trustRank(e.coalesce(1), seeds, iters = 2)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r1 == r2)
    // each seed keeps at least its own teleport share, split by k=2
    val pBase = ((15L * 1000000000000L) / 100L) / 2
    assert(r1("a") >= pBase && r1("b") >= pBase)
    // total mass bounded by the fixed-point total
    assert(r1.values.sum <= 1000000000000L)
  }

  test("trustRank rejects an empty seed set") {
    val e = edgesDf(Seq(("a", "b", 1L)))
    val ex = intercept[IllegalArgumentException] {
      GraphOps.trustRank(e, col("id") === "nope", iters = 1)
    }
    assert(ex.getMessage.contains("seed"))
  }

  private def triplesDf(rows: Seq[(String, String, String, String, String)]) = {
    import spark.implicits._
    rows.toDF("subj", "subj_type", "pred", "obj", "obj_type")
  }

  test("conflicts: counts, dominant argmax, permille; single-pred pairs excluded") {
    val t = triplesDf(Seq(
      // (a,b): 2 pos + 1 neg -> dominant pos, 333 permille contradiction
      ("a", "ORG", "pos", "b", "GPE"),
      ("a", "ORG", "pos", "b", "GPE"),
      ("a", "ORG", "neg", "b", "GPE"),
      // (c,d): single predicate -> excluded
      ("c", "ORG", "pos", "d", "GPE"),
      // (e,f): pos == neg tie -> dominant neg (label asc), 500 permille
      ("e", "ORG", "pos", "f", "GPE"),
      ("e", "ORG", "neg", "f", "GPE")))
    val got = GraphBuilder.conflicts(t).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6), r.getLong(7)))
      .toMap
    assert(got.keySet == Set(("ORG.a", "GPE.b"), ("ORG.e", "GPE.f")))
    assert(got(("ORG.a", "GPE.b")) == ((2L, 1L, 0L, 3L, "pos", 333L)))
    assert(got(("ORG.e", "GPE.f")) == ((1L, 1L, 0L, 2L, "neg", 500L)))
  }

  test("conflicts: neu/pos tie goes to neu when neg lost") {
    val t = triplesDf(Seq(
      ("x", "ORG", "neu", "y", "GPE"),
      ("x", "ORG", "pos", "y", "GPE")))
    val row = GraphBuilder.conflicts(t).collect().head
    assert(row.getString(6) == "neu")
    assert(row.getLong(7) == 500L)
  }

  test("temporalPaths2 matches a driver-side recomputation on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val hist = graft.ops.DocKg.edgeHistory(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(4), r.getLong(5))) // source, target, sent, first_seen, last_seen
    val expected = (for {
      (a, b1, s1, t1, _) <- hist
      (b2, c, s2, _, t2) <- hist
      if b1 == b2 && a != c && t1 <= t2
    } yield (a, b1, c, s1, s2, t1, t2)).toSet
    val got = graft.ops.DocKg.temporalPaths2(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
    assert(got.forall { case (a, _, c, _, _, t1, t2) => a != c && t1 <= t2 })
  }
}
