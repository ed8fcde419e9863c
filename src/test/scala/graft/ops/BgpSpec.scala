package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.ops.Bgp.Pat

/** Basic-graph-pattern matcher semantics and the TextRank keyword graph. */
class BgpSpec extends AnyFunSuite with SparkTestSession {

  private def rel = {
    import spark.implicits._
    Seq(
      ("a", "pos", "b"), ("b", "neg", "c"), ("b", "neg", "d"),
      ("x", "pos", "b"), ("a", "neg", "b"), ("c", "likes", "c"),
      ("d", "likes", "e")).toDF("s", "p", "o")
  }

  test("two-pattern chain joins on the shared variable") {
    val got = Bgp.matchPatterns(rel, Seq(Pat("?x", "pos", "?y"), Pat("?y", "neg", "?z")))
      .collect().map(r => (r.getString(1), r.getString(0), r.getString(2))).toSet
    // (x, y, z): pos edges into b from a and x; neg out of b to c and d
    assert(got == Set(("a", "b", "c"), ("a", "b", "d"), ("x", "b", "c"), ("x", "b", "d")))
  }

  test("constants filter; single pattern with one variable") {
    val got = Bgp.matchPatterns(rel, Seq(Pat("b", "neg", "?z")))
      .collect().map(_.getString(0)).toSet
    assert(got == Set("c", "d"))
  }

  test("repeated variable within a pattern forces equality") {
    val got = Bgp.matchPatterns(rel, Seq(Pat("?x", "likes", "?x")))
      .collect().map(_.getString(0)).toSet
    assert(got == Set("c")) // d likes e does not bind ?x twice
  }

  test("predicate variable binds") {
    val got = Bgp.matchPatterns(rel, Seq(Pat("a", "?p", "b")))
      .collect().map(_.getString(0)).toSet
    assert(got == Set("pos", "neg"))
  }

  test("disconnected pattern is rejected (no cartesian)") {
    val ex = intercept[IllegalArgumentException] {
      Bgp.matchPatterns(rel, Seq(Pat("?x", "pos", "?y"), Pat("?u", "neg", "?v")))
    }
    assert(ex.getMessage.contains("cartesian"))
  }

  test("set semantics: duplicate triples do not multiply solutions") {
    val dup = rel.union(rel)
    val a = Bgp.matchPatterns(dup, Seq(Pat("?x", "pos", "?y"), Pat("?y", "neg", "?z"))).count()
    val b = Bgp.matchPatterns(rel, Seq(Pat("?x", "pos", "?y"), Pat("?y", "neg", "?z"))).count()
    assert(a == b)
  }

  test("three-pattern chain extends bindings left-deep") {
    import spark.implicits._
    val r3 = Seq(("a", "p1", "b"), ("b", "p2", "c"), ("c", "p3", "d"))
      .toDF("s", "p", "o")
    val got = Bgp.matchPatterns(r3,
      Seq(Pat("?x", "p1", "?y"), Pat("?y", "p2", "?z"), Pat("?z", "p3", "?w")))
      .collect()
    assert(got.length == 1)
  }

  test("boundedPath: per-length distinct endpoint pairs under alternation") {
    val got = Bgp.boundedPath(rel, Seq("pos", "neg"), maxLen = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // len 1: every pos/neg edge; len 2: a->b->{c,d} (pos.neg and neg.neg),
    // x->b->{c,d}, plus nothing out of c/d (their edges are 'likes')
    val len1 = Set(("a", "b"), ("b", "c"), ("b", "d"), ("x", "b"))
    val len2 = Set(("a", "c"), ("a", "d"), ("x", "c"), ("x", "d"))
    assert(got == len1.map { case (x, z) => (x, z, 1L) } ++
      len2.map { case (x, z) => (x, z, 2L) })
  }

  test("boundedPath: duplicate edges never multiply pairs; a pair reachable at two lengths keeps both rows") {
    import spark.implicits._
    // diamond a->b->d and a->c->d plus a direct a->d: (a,d) at len 1 AND 2, once each
    val r = Seq(("a", "p", "b"), ("b", "p", "d"), ("a", "p", "c"), ("c", "p", "d"),
      ("a", "p", "d"), ("a", "p", "d")).toDF("s", "p", "o")
    val got = Bgp.boundedPath(r, Seq("p"), maxLen = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.length == got.distinct.length) // set semantics per length
    assert(got.count { case (x, z, _) => x == "a" && z == "d" } == 2)
    val ex = intercept[IllegalArgumentException] { Bgp.boundedPath(r, Seq(), 2) }
    assert(ex.getMessage.contains("empty"))
  }

  test("mineChainRules: AMIE metrics computed exactly; witnesses never inflate support") {
    import spark.implicits._
    // body p.q reaches (a,c) and (d,f); head r holds only (a,c):
    // rule p∧q⇒r has support 1 of body 2 (conf 500‰), head 1 (coverage 1000‰)
    val rel = Seq(
      ("a", "p", "b"), ("b", "q", "c"), ("a", "r", "c"),
      ("d", "p", "e"), ("e", "q", "f"),
      ("a", "p", "b")) // duplicate triple must not change any metric
      .toDF("s", "p", "o")
    val got = Bgp.mineChainRules(rel).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap
    assert(got == Map(("p", "q", "r") -> (1L, 2L, 1L, 500L, 1000L)))
  }

  test("mineChainRules: two-witness path counts one body pair (set semantics)") {
    import spark.implicits._
    // a->b1->c and a->b2->c: one distinct (a,c) body pair for p.p
    val rel = Seq(("a", "p", "b1"), ("b1", "p", "c"),
      ("a", "p", "b2"), ("b2", "p", "c"), ("a", "p", "c")).toDF("s", "p", "o")
    val got = Bgp.mineChainRules(rel).collect()
    assert(got.length == 1)
    val r = got.head
    // body pairs: (a,c), (a,b1)? no—b1 reached only via a->b1 (len 1).
    // chains: a->b1->c, a->b2->c, a->c->? none => body = {(a,c)}; head p
    // holds (a,c) so support 1; head_pairs = 5 distinct triples
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) == (1L, 1L, 5L))
  }

  test("ruleCompletions: confident rules predict missing heads; known edges anti-joined away") {
    import spark.implicits._
    // rule p∧q⇒r with conf 500‰ (support (a,c) of body {(a,c),(d,f)}):
    // it predicts r(d,f) — the body pair WITHOUT the head edge; r(a,c)
    // already exists so it must not be re-predicted
    val rel = Seq(
      ("a", "p", "b"), ("b", "q", "c"), ("a", "r", "c"),
      ("d", "p", "e"), ("e", "q", "f")).toDF("s", "p", "o")
    val got = Bgp.ruleCompletions(rel, minConfPermille = 500L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSet == Set(("d", "r", "f", 500L)))
    // raising the bar above the rule's confidence yields nothing
    assert(Bgp.ruleCompletions(rel, minConfPermille = 501L).isEmpty)
  }

  test("textRankKeywords: symmetric graph ranks symmetric terms equally; self-pairs dropped") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // "a b a" gives a<->b twice; "c c d" gives only c<->d (self-pair c,c dropped)
    val df = Seq("a b a", "c c d").toDF("text")
    val got = TextStats.textRankKeywords(df, col("text"), iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set("a", "b", "c", "d"))
    assert(got("a") == got("b")) // perfectly symmetric neighborhood
    assert(got("c") == got("d"))
    // a<->b edge has weight 2, c<->d weight 1 — but ranks are per-node mass
    // shares; with 4 nodes and symmetric pairs, all equal under the exact
    // recurrence (each node's single out-edge carries its full rank)
    assert(got("a") == got("c"))
  }

  test("OPTIONAL extends matched solutions and NULL-pads the rest") {
    val got = Bgp.matchOptional(rel,
        Seq(Pat("?x", "pos", "?y")), Seq(Pat("?y", "neg", "?z")))
      .collect().map(r => (r.getAs[String]("x"), r.getAs[String]("y"),
        Option(r.getAs[String]("z")))).toSet
    // pos solutions (a,b) and (x,b) both extend through b's neg edges to c,d
    assert(got == Set(("a", "b", Some("c")), ("a", "b", Some("d")),
      ("x", "b", Some("c")), ("x", "b", Some("d"))))
    // a solution whose optional group finds nothing survives with NULL z
    val pad = Bgp.matchOptional(rel,
        Seq(Pat("?x", "likes", "?y")), Seq(Pat("?y", "neg", "?z")))
      .collect().map(r => (r.getAs[String]("x"), Option(r.getAs[String]("z")))).toSet
    assert(pad == Set(("c", None), ("d", None))) // c,e have no neg out-edges
  }

  test("OPTIONAL with no shared variable is rejected") {
    val ex = intercept[IllegalArgumentException] {
      Bgp.matchOptional(rel, Seq(Pat("?x", "pos", "?y")), Seq(Pat("?u", "likes", "?v")))
    }
    assert(ex.getMessage.contains("OPTIONAL"))
  }

  test("NOT EXISTS drops solutions the negative group matches") {
    val got = Bgp.matchNotExists(rel,
        Seq(Pat("?x", "pos", "?y")), Seq(Pat("?x", "neg", "?y")))
      .collect().map(r => (r.getAs[String]("x"), r.getAs[String]("y"))).toSet
    // pos pairs: (a,b),(x,b); (a,b) also holds under neg — only (x,b) survives
    assert(got == Set(("x", "b")))
    // duplicate triples in the negative group do not over-remove or duplicate
    val dup = Bgp.matchNotExists(rel.union(rel),
        Seq(Pat("?x", "pos", "?y")), Seq(Pat("?x", "neg", "?y"))).count()
    assert(dup == 1L)
  }

  test("CONSTRUCT rewrites solutions through the template, deduplicated") {
    val got = Bgp.construct(rel,
        Seq(Pat("?x", "pos", "?y"), Pat("?y", "neg", "?z")),
        Seq(Pat("?x", "reaches", "?z"), Pat("?z", "reached_by", "?x")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      ("a", "reaches", "c"), ("a", "reaches", "d"),
      ("x", "reaches", "c"), ("x", "reaches", "d"),
      ("c", "reached_by", "a"), ("d", "reached_by", "a"),
      ("c", "reached_by", "x"), ("d", "reached_by", "x")))
    // constant template positions and dedup: two solutions binding the same
    // template terms collapse to one constructed triple
    val one = Bgp.construct(rel, Seq(Pat("?x", "pos", "b")),
      Seq(Pat("likes_b", "marker", "seen"))).collect()
    assert(one.length == 1 && one.head.getString(0) == "likes_b")
  }

  test("CONSTRUCT with an unbound template variable fails fast") {
    val ex = intercept[IllegalArgumentException] {
      Bgp.construct(rel, Seq(Pat("?x", "pos", "?y")), Seq(Pat("?x", "p", "?missing")))
    }
    assert(ex.getMessage.contains("unbound"))
  }

  test("UNION pads variables absent from a group with NULL") {
    val got = Bgp.matchUnion(rel, Seq(
        Seq(Pat("?x", "pos", "?y")), Seq(Pat("?x", "likes", "?z"))))
      .collect().map(r => (r.getAs[String]("x"),
        Option(r.getAs[String]("y")), Option(r.getAs[String]("z")))).toSet
    assert(got == Set(
      ("a", Some("b"), None), ("x", Some("b"), None),
      ("c", None, Some("c")), ("d", None, Some("e"))))
  }

  test("MINUS removes compatible solutions; disjoint domains remove nothing") {
    val got = Bgp.matchMinus(rel,
        Seq(Pat("?x", "pos", "?y")), Seq(Pat("?x", "neg", "?y")))
      .collect().map(r => (r.getAs[String]("x"), r.getAs[String]("y"))).toSet
    assert(got == Set(("x", "b"))) // (a,b) holds under neg too
    // SPARQL quirk: a minus group sharing NO variable keeps every solution
    val all = Bgp.matchMinus(rel,
      Seq(Pat("?x", "pos", "?y")), Seq(Pat("?u", "likes", "?v"))).count()
    assert(all == 2L)
  }

  test("matchAggregate groups solutions with HAVING; unbound agg var fails fast") {
    val got = Bgp.matchAggregate(rel,
        Seq(Pat("?x", "pos", "?y"), Pat("?y", "neg", "?z")),
        groupVars = Seq("?x"), aggVar = "?z", havingMinCount = 2L)
      .collect().map(r => (r.getAs[String]("x"), r.getAs[Long]("n_solutions"),
        r.getAs[String]("agg_min"), r.getAs[String]("agg_max"))).toSet
    // both a and x reach {c, d} through b — two solutions each
    assert(got == Set(("a", 2L, "c", "d"), ("x", 2L, "c", "d")))
    // HAVING above the count drops every group
    assert(Bgp.matchAggregate(rel,
      Seq(Pat("?x", "pos", "?y"), Pat("?y", "neg", "?z")),
      Seq("?x"), "?z", havingMinCount = 3L).isEmpty)
    // set semantics: duplicated triples do not inflate n_solutions
    val dup = Bgp.matchAggregate(rel.union(rel),
        Seq(Pat("?x", "pos", "?y"), Pat("?y", "neg", "?z")), Seq("?x"), "?z")
      .collect().map(r => r.getAs[Long]("n_solutions")).toSet
    assert(dup == Set(2L))
    val ex = intercept[IllegalArgumentException] {
      Bgp.matchAggregate(rel, Seq(Pat("?x", "pos", "?y")), Seq("?x"), "?nope")
    }
    assert(ex.getMessage.contains("not bound"))
  }

  test("viewDelta equals recompute-minus-old on every split of a diamond KG") {
    import spark.implicits._
    val rows = Seq(
      ("a", "p", "b"), ("b", "q", "c"), ("b", "q", "d"),
      ("x", "p", "b"), ("x", "p", "y"), ("y", "q", "c"))
    val pats = Seq(Pat("?x", "p", "?y"), Pat("?y", "q", "?z"))
    def sols(rs: Seq[(String, String, String)]) =
      Bgp.matchPatterns(rs.toDF("s", "p", "o"), pats).collect()
        .map(r => (r.getAs[String]("x"), r.getAs[String]("y"), r.getAs[String]("z"))).toSet
    val full = sols(rows)
    // exhaustive over single-triple deltas: engine delta == recompute delta
    for (i <- rows.indices) {
      val baseRows = rows.patch(i, Nil, 1)
      val got = Bgp.viewDelta(baseRows.toDF("s", "p", "o"),
          Seq(rows(i)).toDF("s", "p", "o"), pats).collect()
        .map(r => (r.getAs[String]("x"), r.getAs[String]("y"), r.getAs[String]("z"))).toSet
      assert(got == full -- sols(baseRows), s"split $i")
    }
  }

  test("viewDelta/viewDeltaRetract: a predicate manifest skips only provably-empty terms") {
    import spark.implicits._
    val base = Seq(("a", "p", "b"), ("b", "q", "c"), ("x", "p", "b"),
      ("b", "q", "d")).toDF("s", "p", "o")
    val pats = Seq(Pat("?x", "p", "?y"), Pat("?y", "q", "?z"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    // a p-only delta: the q-term is provably empty — pruned result identical
    val dp = Seq(("n", "p", "b")).toDF("s", "p", "o")
    assert(rows(Bgp.viewDelta(base, dp, pats, deltaPreds = Some(Seq("p")))) ==
      rows(Bgp.viewDelta(base, dp, pats)))
    val rm = Seq(("x", "p", "b")).toDF("s", "p", "o")
    assert(rows(Bgp.viewDeltaRetract(base, rm, pats, deltaPreds = Some(Seq("p")))) ==
      rows(Bgp.viewDeltaRetract(base, rm, pats)))
    // a manifest covering NO pattern yields the empty (schema-correct) delta
    assert(Bgp.viewDelta(base, dp, pats, deltaPreds = Some(Seq("zzz"))).isEmpty)
    assert(Bgp.viewDeltaRetract(base, rm, pats, deltaPreds = Some(Seq("zzz"))).isEmpty)
    // variable / inverse / negated predicates are conservatively kept
    val patsV = Seq(Pat("?x", "?r", "?y"), Pat("?y", "^p", "?z"))
    assert(rows(Bgp.viewDelta(base, dp, patsV, deltaPreds = Some(Seq("p")))) ==
      rows(Bgp.viewDelta(base, dp, patsV)))
  }

  test("viewDelta: duplicate-of-base delta triple adds nothing; empty delta is empty") {
    import spark.implicits._
    val base = Seq(("a", "p", "b"), ("b", "q", "c")).toDF("s", "p", "o")
    val dupDelta = Seq(("a", "p", "b")).toDF("s", "p", "o")
    assert(Bgp.viewDelta(base, dupDelta,
      Seq(Pat("?x", "p", "?y"), Pat("?y", "q", "?z"))).isEmpty)
    assert(Bgp.viewDelta(base, base.limit(0),
      Seq(Pat("?x", "p", "?y"), Pat("?y", "q", "?z"))).isEmpty)
    // a delta triple completing a NEW chain yields exactly that solution
    val newDelta = Seq(("c", "q", "d"), ("b", "q", "d")).toDF("s", "p", "o")
    val got = Bgp.viewDelta(base, newDelta,
        Seq(Pat("?x", "p", "?y"), Pat("?y", "q", "?z"))).collect()
      .map(r => (r.getAs[String]("x"), r.getAs[String]("y"), r.getAs[String]("z"))).toSet
    assert(got == Set(("a", "b", "d")))
  }

  test("reachability computes the exact fixpoint and terminates on cycles") {
    import spark.implicits._
    // chain a->b->c->d plus a cycle d->a, and a decoy predicate edge
    val g = Seq(("a", "r", "b"), ("b", "r", "c"), ("c", "r", "d"),
      ("d", "r", "a"), ("a", "other", "z")).toDF("s", "p", "o")
    val got = Bgp.reachability(g, Seq("r"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // strongly connected 4-cycle: every ordered pair incl. self-loops
    val nodes = Set("a", "b", "c", "d")
    assert(got == (for (x <- nodes; z <- nodes) yield (x, z)).toSet)
  }

  test("reachability seeded restricts to paths starting at the seeds") {
    import spark.implicits._
    val g = Seq(("a", "r", "b"), ("b", "r", "c"), ("x", "r", "y"))
      .toDF("s", "p", "o")
    val got = Bgp.reachability(g, Seq("r"), seeds = Seq("a"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "b"), ("a", "c")))
  }

  test("reachability agrees with boundedPath endpoints at the diameter; duplicates don't multiply") {
    import spark.implicits._
    val g = Seq(("a", "r", "b"), ("b", "r", "c"), ("c", "r", "d")).toDF("s", "p", "o")
    val viaBounded = Bgp.boundedPath(g, Seq("r"), maxLen = 3)
      .select("x", "z").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val viaFixpoint = Bgp.reachability(g.union(g), Seq("r"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaFixpoint == viaBounded)
    assert(Bgp.reachability(g.union(g), Seq("r")).count() == viaFixpoint.size)
  }

  test("reachability beyond maxIter fails fast instead of returning a partial closure") {
    import spark.implicits._
    val g = Seq(("a", "r", "b"), ("b", "r", "c"), ("c", "r", "d"), ("d", "r", "e"))
      .toDF("s", "p", "o")
    val ex = intercept[IllegalStateException] {
      Bgp.reachability(g, Seq("r"), maxIter = 2)
    }
    assert(ex.getMessage.contains("converge") || ex.getMessage.contains("diameter"))
  }

  test("inverse path ^p matches exactly where the swapped pattern does") {
    val inv = Bgp.matchPatterns(rel, Seq(Pat("?y", "^pos", "?x")))
      .select("x", "y")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val fwd = Bgp.matchPatterns(rel, Seq(Pat("?x", "pos", "?y")))
      .select("x", "y")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(inv == fwd && fwd.nonEmpty)
  }

  test("inverse path chains with a forward pattern on the shared variable") {
    // ?y has a pos edge INTO it (^pos) and a neg edge out of it
    val got = Bgp.matchPatterns(rel,
        Seq(Pat("?y", "^pos", "?x"), Pat("?y", "neg", "?z")))
      .select("x", "y", "z")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(("a", "b", "c"), ("a", "b", "d"), ("x", "b", "c"), ("x", "b", "d")))
  }

  test("negated property set !p1|p2 keeps only the other predicates") {
    val got = Bgp.matchPatterns(rel, Seq(Pat("?x", "!pos|neg", "?y")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("c", "c"), ("d", "e"))) // only the likes edges survive
  }

  test("matchSelect: DISTINCT projection, total order, limit") {
    val got = Bgp.matchSelect(rel,
      Seq(Pat("?x", "pos", "?y"), Pat("?y", "neg", "?z")),
      project = Seq("?x", "?z"), orderBy = Seq("-?x"), limit = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // solutions project to {(a,c),(a,d),(x,c),(x,d)}; x desc, tiebreak z asc
    assert(got == Seq(("x", "c"), ("x", "d"), ("a", "c")))
  }

  test("matchSelect rejects an unbound order variable") {
    val ex = intercept[IllegalArgumentException] {
      Bgp.matchSelect(rel, Seq(Pat("?x", "pos", "?y")),
        project = Seq("?x"), orderBy = Seq("?nope"), limit = 1)
    }
    assert(ex.getMessage.contains("not bound"))
  }

  test("matchWhere: cross-variable and single-variable predicates filter solutions") {
    import org.apache.spark.sql.functions.col
    val got = Bgp.matchWhere(rel,
      Seq(Pat("?x", "pos", "?y"), Pat("?y", "neg", "?z")),
      col("x") =!= "x" && col("z").rlike("^c"))
      .select("x", "z").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "c")))
  }

  test("matchValues restricts solutions to the inline binding rows") {
    val got = Bgp.matchValues(rel,
      Seq(Pat("?x", "pos", "?y"), Pat("?y", "neg", "?z")),
      vars = Seq("?x", "?z"), rows = Seq(Seq("a", "c"), Seq("x", "d"), Seq("q", "q")))
      .select("x", "z").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "c"), ("x", "d"))) // (q,q) binds nothing
  }

  test("matchValues rejects a variable the patterns do not bind") {
    val ex = intercept[IllegalArgumentException] {
      Bgp.matchValues(rel, Seq(Pat("?x", "pos", "?y")),
        vars = Seq("?zz"), rows = Seq(Seq("a")))
    }
    assert(ex.getMessage.contains("not bound"))
  }

  private def quads = {
    import spark.implicits._
    Seq(
      ("g1", "a", "pos", "b"), ("g1", "b", "neg", "c"),
      ("g2", "a", "pos", "b"), ("g3", "b", "neg", "d")).toDF("g", "s", "p", "o")
  }

  test("matchQuads: a shared graph variable scopes the chain within-graph") {
    import Bgp.QPat
    val got = Bgp.matchQuads(quads,
        Seq(QPat("?g", "?x", "pos", "?y"), QPat("?g", "?y", "neg", "?z")))
      .select("g", "x", "y", "z")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    // only g1 has BOTH hops; g2's pos + g3's neg must NOT combine
    assert(got == Set(("g1", "a", "b", "c")))
  }

  test("matchQuads: distinct graph variables query across graphs") {
    import Bgp.QPat
    val got = Bgp.matchQuads(quads,
        Seq(QPat("?g1", "?x", "pos", "?y"), QPat("?g2", "?y", "neg", "?z")))
      .select("g1", "g2", "z")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(("g1", "g1", "c"), ("g1", "g3", "d"),
      ("g2", "g1", "c"), ("g2", "g3", "d")))
  }

  test("matchQuads: constant graph pins the provenance") {
    import Bgp.QPat
    val got = Bgp.matchQuads(quads, Seq(QPat("g2", "?x", "pos", "?y")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "b")))
  }

  test("ask returns 1 for a satisfiable BGP and 0 for an unsatisfiable one") {
    assert(Bgp.ask(rel, Seq(Pat("?x", "pos", "?y"), Pat("?y", "neg", "?z")))
      .collect().head.getLong(0) == 1L)
    assert(Bgp.ask(rel, Seq(Pat("?x", "nope", "?y")))
      .collect().head.getLong(0) == 0L)
  }

  test("seqPath composes forward and inverse steps in order") {
    import spark.implicits._
    val g = Seq(
      ("p1", "by", "s1"), ("p2", "by", "s1"), ("p3", "by", "s2"),
      ("s1", "in", "n1")).toDF("s", "p", "o")
    // co-supplier pairs: by/^by
    val co = Bgp.seqPath(g, Seq("by", "^by"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(co == Set(("p1", "p1"), ("p1", "p2"), ("p2", "p1"), ("p2", "p2"),
      ("p3", "p3")))
    // part -> supplier -> nation: by/in
    val pn = Bgp.seqPath(g, Seq("by", "in"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pn == Set(("p1", "n1"), ("p2", "n1")))
  }

  test("matchGroupConcat: distinct values, ascending, deterministic under repartition") {
    val q = Seq(Pat("?x", "pos", "?y"), Pat("?y", "neg", "?z"))
    val got = Bgp.matchGroupConcat(rel, q, Seq("?x"), "?z")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set(("a", 2L, "c,d"), ("x", 2L, "c,d")))
    val reparted = Bgp.matchGroupConcat(rel.repartition(7), q, Seq("?x"), "?z")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(reparted == got)
  }

  test("viewDeltaRetract equals the recompute difference; alternate witnesses survive") {
    import spark.implicits._
    // the (a1, c1) solution has TWO witnesses through b1 and b2: removing
    // only the b1 path must NOT retract it (the DRed rederive step)
    val base = Seq(
      ("a1", "p1", "b1"), ("a1", "p1", "b2"),
      ("b1", "p2", "c1"), ("b2", "p2", "c1"),
      ("a2", "p1", "b3"), ("b3", "p2", "c2")).toDF("s", "p", "o")
    val removed = Seq(("b1", "p2", "c1"), ("b3", "p2", "c2")).toDF("s", "p", "o")
    val pats = Seq(Pat("?x", "p1", "?y"), Pat("?y", "p2", "?z"))
    val got = Bgp.viewDeltaRetract(base, removed, pats)
      .select("x", "y", "z")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // recompute both sides from scratch as the oracle
    val solBase = Bgp.matchPatterns(base, pats).select("x", "y", "z")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val remaining = base.except(removed)
    val solRem = Bgp.matchPatterns(remaining, pats).select("x", "y", "z")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == (solBase -- solRem))
    assert(got == Set(("a1", "b1", "c1"), ("a2", "b3", "c2"))) // (a1,b2,c1) survives
  }

  test("viewDeltaRetract with an untouched view is empty") {
    import spark.implicits._
    val base = Seq(("a", "p1", "b"), ("b", "p2", "c"), ("q", "zz", "w"))
      .toDF("s", "p", "o")
    val removed = Seq(("q", "zz", "w")).toDF("s", "p", "o") // outside the view
    assert(Bgp.viewDeltaRetract(base, removed,
      Seq(Pat("?x", "p1", "?y"), Pat("?y", "p2", "?z"))).count() == 0)
  }

  test("planPatterns: seeds on the most selective pattern, grows connected") {
    val pats = Seq(
      Pat("?x", "pos", "?y"),        // 1 constant
      Pat("?z", "?q", "?w"),         // 0 constants, connects via ?z
      Pat("?y", "neg", "c"))         // 2 constants -> seed
    val planned = Bgp.planPatterns(pats)
    assert(planned.head == Pat("?y", "neg", "c"))
    assert(planned(1) == Pat("?x", "pos", "?y")) // only connectable next
    // a caller-order that would fail fail-fast now chains fine
    val viaAuto = Bgp.matchPatterns(rel,
      Bgp.planPatterns(Seq(Pat("?z", "likes", "?z"), Pat("?y", "neg", "?z"),
        Pat("?x", "pos", "?y"))))
    val viaManual = Bgp.matchPatterns(rel,
      Seq(Pat("?x", "pos", "?y"), Pat("?y", "neg", "?z"), Pat("?z", "likes", "?z")))
    assert(viaAuto.select("x", "y", "z").collect().map(_.toSeq).toSet ==
      viaManual.select("x", "y", "z").collect().map(_.toSeq).toSet)
  }

  test("planPatterns leaves a genuinely disconnected pattern at the tail (still fail-fast)") {
    val planned = Bgp.planPatterns(Seq(Pat("?a", "p1", "?b"), Pat("?u", "p2", "?v")))
    assert(planned == Seq(Pat("?a", "p1", "?b"), Pat("?u", "p2", "?v")))
    val ex = intercept[IllegalArgumentException] {
      Bgp.matchPatterns(rel, planned)
    }
    assert(ex.getMessage.contains("cartesian"))
  }

  test("planPatternsStats orders rarest-first where shape selectivity ties") {
    import spark.implicits._
    // 'hot' has 6 triples, 'mid' 3, 'rare' 1 — every pattern carries exactly
    // one constant, so the shape planner cannot separate them
    val skewed = (
      (1 to 6).map(i => (s"a$i", "hot", s"b$i")) ++
        (1 to 3).map(i => (s"b$i", "mid", s"c$i")) ++
        Seq(("c1", "rare", "d1"))).toDF("s", "p", "o")
    val pats = Seq( // deliberately hottest-first
      Pat("?x", "hot", "?y"), Pat("?y", "mid", "?z"), Pat("?z", "rare", "?w"))
    val planned = Bgp.planPatternsStats(skewed, pats)
    assert(planned == Seq(
      Pat("?z", "rare", "?w"), Pat("?y", "mid", "?z"), Pat("?x", "hot", "?y")))
    // solutions are planner-invariant
    val viaStats = Bgp.matchPatterns(skewed, planned)
      .select("x", "y", "z", "w").collect().map(_.toSeq).toSet
    val viaShape = Bgp.matchPatterns(skewed, pats)
      .select("x", "y", "z", "w").collect().map(_.toSeq).toSet
    assert(viaStats == viaShape && viaStats == Set(Seq("a1", "b1", "c1", "d1")))
  }

  test("planPatternsStats counts inverse and repeated-variable patterns correctly") {
    import spark.implicits._
    val g = Seq(("a", "r", "b"), ("b", "r", "a"), ("c", "r", "c"),
      ("c", "s", "d")).toDF("s", "p", "o")
    // ^s has 1 match, self-loop ?x r ?x has 1, plain r has 3: both cheap
    // patterns must precede the hot one; ^s connects via ?x after the loop
    val planned = Bgp.planPatternsStats(g, Seq(
      Pat("?x", "r", "?y"), Pat("?x", "r", "?x"), Pat("?d", "^s", "?x")))
    assert(planned.head == Pat("?x", "r", "?x")) // card 1, earliest index among ties
    assert(planned(1) == Pat("?d", "^s", "?x"))  // card 1, connected via ?x
    assert(planned(2) == Pat("?x", "r", "?y"))   // card 3 last
  }

  test("view maintenance property: delta and retract equal recompute on random splits") {
    import spark.implicits._
    val rnd = new scala.util.Random(7) // fixed seed — deterministic trials
    val preds = Seq("p1", "p2")
    val nodes = (0 until 6).map(i => s"n$i")
    val pats = Seq(Pat("?a", "p1", "?b"), Pat("?b", "p2", "?c"))
    def sols(df: org.apache.spark.sql.DataFrame) =
      Bgp.matchPatterns(df, pats).select("a", "b", "c").collect().map(_.toSeq).toSet
    for (trial <- 1 to 4) {
      val all = (1 to 30).map(_ =>
        (nodes(rnd.nextInt(6)), preds(rnd.nextInt(2)), nodes(rnd.nextInt(6)))).distinct
      // deterministic split (String.hashCode is stable across JVMs)
      val (keep, move) = all.partition(t => (t._1 + t._2 + t._3).hashCode % 2 == 0)
      if (move.nonEmpty && keep.nonEmpty) {
        val keepDf = keep.toDF("s", "p", "o")
        val moveDf = move.toDF("s", "p", "o")
        val allDf = all.toDF("s", "p", "o")
        val expected = sols(allDf) -- sols(keepDf)
        val viaDelta = Bgp.viewDelta(keepDf, moveDf, pats)
          .select("a", "b", "c").collect().map(_.toSeq).toSet
        assert(viaDelta == expected, s"viewDelta trial $trial")
        val viaRetract = Bgp.viewDeltaRetract(allDf, moveDf, pats)
          .select("a", "b", "c").collect().map(_.toSeq).toSet
        assert(viaRetract == expected, s"viewDeltaRetract trial $trial")
      }
    }
  }

  test("cheaplyDerived: narrow ops over materialized blocks yes; joins/aggregates/scans no") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ckpt = Seq(("a", "p", "b")).toDF("s", "p", "o").localCheckpoint(true)
    assert(Bgp.cheaplyDerived(ckpt))
    assert(Bgp.cheaplyDerived(ckpt.select("s", "p", "o").filter(col("p") === "p")))
    assert(Bgp.cheaplyDerived(ckpt.unionByName(ckpt.filter(col("s") =!= "zz"))))
    assert(Bgp.cheaplyDerived(rel)) // literal rows (LocalRelation)
    assert(!Bgp.cheaplyDerived(ckpt.join(ckpt, Seq("s"))))
    assert(!Bgp.cheaplyDerived(ckpt.distinct()))
    assert(!Bgp.cheaplyDerived(ckpt.groupBy("s").count()))
  }

  test("planner invariance property: stats plan == shape plan solutions on random KGs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42) // fixed seed — deterministic trials
    val preds = Seq("p1", "p2", "p3")
    val nodes = (0 until 8).map(i => s"n$i")
    for (trial <- 1 to 5) {
      val g = (1 to 40).map { _ =>
        (nodes(rnd.nextInt(8)), preds(rnd.nextInt(3)), nodes(rnd.nextInt(8)))
      }.distinct.toDF("s", "p", "o")
      val pats = Seq(
        Pat("?a", preds(rnd.nextInt(3)), "?b"), Pat("?b", preds(rnd.nextInt(3)), "?c"))
      val byStats = Bgp.matchPatterns(g, Bgp.planPatternsStats(g, pats))
        .select("a", "b", "c").collect().map(_.toSeq).toSet
      val byShape = Bgp.matchPatterns(g, Bgp.planPatterns(pats))
        .select("a", "b", "c").collect().map(_.toSeq).toSet
      assert(byStats == byShape, s"trial $trial diverged")
    }
  }

  test("planPatternsStats: empty relation and disconnected tail stay deterministic") {
    import spark.implicits._
    val empty = Seq.empty[(String, String, String)].toDF("s", "p", "o")
    val pats = Seq(Pat("?a", "p1", "?b"), Pat("?b", "p2", "?c"))
    assert(Bgp.planPatternsStats(empty, pats) == pats) // all-zero cards -> input order
    val disc = Bgp.planPatternsStats(rel,
      Seq(Pat("?a", "pos", "?b"), Pat("?u", "likes", "?v")))
    assert(disc == Seq(Pat("?a", "pos", "?b"), Pat("?u", "likes", "?v")))
    val ex = intercept[IllegalArgumentException] { Bgp.matchPatterns(rel, disc) }
    assert(ex.getMessage.contains("cartesian"))
  }

  test("describe returns slot-tagged triples touching the node set") {
    val got = Bgp.describe(rel, Seq("b", "e"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    assert(got == Set(
      ("a", "pos", "b", "o"), ("x", "pos", "b", "o"), ("a", "neg", "b", "o"),
      ("b", "neg", "c", "s"), ("b", "neg", "d", "s"), ("d", "likes", "e", "o")))
    // 'both' when subject and object are described
    val both = Bgp.describe(rel, Seq("c")).collect()
      .map(r => (r.getString(0), r.getString(3))).toSet
    assert(both.contains(("c", "both"))) // c likes c
  }

  test("planPatternsCached matches the scan planner's order from persisted counts") {
    import spark.implicits._
    val skewed = (
      (1 to 6).map(i => (s"a$i", "hot", s"b$i")) ++
        (1 to 3).map(i => (s"b$i", "mid", s"c$i")) ++
        Seq(("c1", "rare", "d1"))).toDF("s", "p", "o")
    val pats = Seq(
      Pat("?x", "hot", "?y"), Pat("?y", "mid", "?z"), Pat("?z", "rare", "?w"))
    // the cached planner gets the same order as the scanning planner from a
    // driver-side count map — zero Spark jobs at plan time
    val stats = Map("hot" -> 6L, "mid" -> 3L, "rare" -> 1L)
    assert(Bgp.planPatternsCached(stats, 10L, pats) ==
      Bgp.planPatternsStats(skewed, pats))
    // estimate refinements: extra constants and negated sets stay ordered
    val pats2 = Seq(Pat("?x", "hot", "?y"), Pat("a1", "hot", "?y"),
      Pat("?x", "!hot", "?y"))
    val planned2 = Bgp.planPatternsCached(stats, 10L, pats2)
    assert(planned2.head == Pat("a1", "hot", "?y")) // 6/100 beats 6 and 4
    // round-trip through the persisted form
    val pstats = Bgp.predicateStats(skewed).collect()
    val m = pstats.filterNot(_.isNullAt(0)).map(r => r.getString(0) -> r.getLong(1)).toMap
    val tot = pstats.collectFirst { case r if r.isNullAt(0) => r.getLong(1) }.get
    assert(m == stats && tot == 10L)
  }

  test("seqPath deduplicates multi-witness endpoint pairs per hop") {
    import spark.implicits._
    val g = Seq(
      ("a", "r", "m1"), ("a", "r", "m2"),
      ("m1", "t", "z"), ("m2", "t", "z")).toDF("s", "p", "o")
    val got = Bgp.seqPath(g, Seq("r", "t")).collect()
    assert(got.length == 1) // (a, z) once, despite two paths
  }
}
