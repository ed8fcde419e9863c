package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.ops.Shapes.{CardShape, ClosedShape, RangeShape}

/** SHACL-style shape validation and slot profiling (ops/Shapes). */
class ShapesSpec extends AnyFunSuite with SparkTestSession {

  // typed KG: orders o1 (2 parts), o2 (1 part), o3 (0 parts — exists only as
  // a `placed` object); supplier s1 in two nations (max violation); customer
  // c2 placed nothing (min violation via the located_in occurrence)
  private def rel = {
    import spark.implicits._
    Seq(
      ("c1", "CUSTOMER", "placed", "o1", "ORDER"),
      ("c1", "CUSTOMER", "placed", "o2", "ORDER"),
      ("c1", "CUSTOMER", "placed", "o3", "ORDER"),
      ("o1", "ORDER", "contains", "p1", "PART"),
      ("o1", "ORDER", "contains", "p2", "PART"),
      ("o2", "ORDER", "contains", "p1", "PART"),
      ("s1", "SUPPLIER", "located_in", "n1", "NATION"),
      ("s1", "SUPPLIER", "located_in", "n2", "NATION"),
      ("c2", "CUSTOMER", "located_in", "n1", "NATION")
    ).toDF("s", "s_type", "p", "o", "o_type")
  }

  test("cardinality: min/max violations with zero-edge focus nodes included") {
    val got = Shapes.cardinalityViolations(rel, Seq(
        CardShape("ORDER", "contains", 2L, 5L),
        CardShape("SUPPLIER", "located_in", 1L, 1L),
        CardShape("CUSTOMER", "placed", 1L, 2L)))
      .collect().map(r => (r.getAs[String]("focus"), r.getAs[String]("pred"),
        r.getAs[String]("kind"), r.getAs[Long]("observed"), r.getAs[Long]("bound")))
      .toSet
    assert(got == Set(
      ("o2", "contains", "min_count", 1L, 2L),
      ("o3", "contains", "min_count", 0L, 2L), // object-only node still shaped
      ("s1", "located_in", "max_count", 2L, 1L),
      ("c1", "placed", "max_count", 3L, 2L),
      ("c2", "placed", "min_count", 0L, 1L)))
  }

  test("cardinality counts distinct triples, not evidence multiplicity") {
    val dup = rel.union(rel)
    val got = Shapes.cardinalityViolations(dup,
        Seq(CardShape("ORDER", "contains", 2L, 5L)))
      .collect().map(r => (r.getAs[String]("focus"), r.getAs[Long]("observed"))).toSet
    assert(got == Set(("o2", 1L), ("o3", 0L))) // o1 stays at 2, not 4
  }

  test("range: only disallowed object classes surface") {
    val got = Shapes.rangeViolations(rel,
        Seq(RangeShape("placed", Seq("ORDER")), RangeShape("located_in", Seq("CITY"))))
      .collect().map(r => (r.getAs[String]("focus"), r.getAs[String]("pred"),
        r.getAs[String]("obj_type"))).toSet
    // every placed object IS an ORDER; every located_in object violates CITY
    assert(got == Set(("s1", "located_in", "NATION"), ("c2", "located_in", "NATION")))
  }

  test("closed: predicates outside a shaped class's allowed set surface once") {
    val got = Shapes.closedViolations(rel.union(rel), Seq( // dups collapse
        ClosedShape("CUSTOMER", Seq("placed")),
        ClosedShape("ORDER", Seq("contains"))))
      .collect().map(r => (r.getAs[String]("focus"), r.getAs[String]("ftype"),
        r.getAs[String]("pred")))
    // c2's located_in is the only closed-shape breach; SUPPLIER is unshaped
    assert(got.toSeq == Seq(("c2", "CUSTOMER", "located_in")))
    val ex = intercept[IllegalArgumentException] {
      Shapes.closedViolations(rel, Seq())
    }
    assert(ex.getMessage.contains("no closed shapes"))
  }

  test("slot profile marks the modal class and flags heterogeneous slots") {
    import spark.implicits._
    val mixed = rel.union(Seq(
      ("x1", "WAREHOUSE", "located_in", "n1", "NATION")).toDF(rel.columns: _*))
    val rows = Shapes.slotProfile(mixed).collect()
      .map(r => ((r.getAs[String]("pred"), r.getAs[String]("slot"), r.getAs[String]("tpe")),
        (r.getAs[Long]("cnt"), r.getAs[String]("modal_type"), r.getAs[Long]("is_modal"))))
      .toMap
    // located_in subject slot: SUPPLIER 2 (modal), CUSTOMER 1, WAREHOUSE 1
    assert(rows(("located_in", "s", "SUPPLIER")) == ((2L, "SUPPLIER", 1L)))
    assert(rows(("located_in", "s", "CUSTOMER")) == ((1L, "SUPPLIER", 0L)))
    assert(rows(("located_in", "s", "WAREHOUSE")) == ((1L, "SUPPLIER", 0L)))
    // homogeneous slots are all modal
    assert(rows(("contains", "o", "PART")) == ((3L, "PART", 1L)))
  }

  test("tie on count breaks to the class-ascending modal (deterministic)") {
    import spark.implicits._
    val tied = Seq(
      ("a", "B_TYPE", "rel", "x", "T"),
      ("b", "A_TYPE", "rel", "y", "T")).toDF("s", "s_type", "p", "o", "o_type")
    val modal = Shapes.slotProfile(tied).collect()
      .filter(r => r.getAs[String]("slot") == "s")
      .map(_.getAs[String]("modal_type")).toSet
    assert(modal == Set("A_TYPE")) // count 1 == 1, asc class wins
  }

  private def pairRel = {
    import spark.implicits._
    Seq(
      ("f1", "likes", "x"), ("f1", "hates", "x"),   // disjoint violation
      ("f1", "likes", "y"),                          // equals violation (likes only)
      ("f2", "hates", "z"),                          // no likes at all
      ("f2", "mirrors", "z"), ("f2", "hates2", "z")  // unshaped predicates
    ).toDF("s", "p", "o")
  }

  test("propertyPairViolations: disjoint flags values asserted under both predicates") {
    val got = Shapes.propertyPairViolations(pairRel,
        Seq(Shapes.PairShape("likes", "hates", "disjoint")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("f1", "x")))
  }

  test("propertyPairViolations: equals flags the symmetric difference per focus") {
    val got = Shapes.propertyPairViolations(pairRel,
        Seq(Shapes.PairShape("likes", "hates", "equals")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // f1: likes {x,y} vs hates {x} -> y one-sided; f2: hates {z} one-sided
    assert(got == Set(("f1", "y"), ("f2", "z")))
  }

  test("propertyPairViolations: several shapes union with their kind labels") {
    val got = Shapes.propertyPairViolations(pairRel, Seq(
        Shapes.PairShape("likes", "hates", "disjoint"),
        Shapes.PairShape("mirrors", "hates2", "equals")))
      .collect().map(r => (r.getString(0), r.getString(4))).toSet
    assert(got == Set(("f1", "disjoint"))) // mirrors == hates2 on f2: no equals rows
  }

  test("PairShape rejects an unknown kind") {
    val ex = intercept[IllegalArgumentException] {
      Shapes.PairShape("a", "b", "overlaps")
    }
    assert(ex.getMessage.contains("unknown"))
  }
}
