package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** RDFS forward chaining: driver-side schema closure, domain/range typing,
  * subclass lift, and the fail-fast cycle guard. */
class RdfsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("subClassClosure derives multi-level ancestry without reflexive pairs") {
    val got = Rdfs.subClassClosure(Seq("A" -> "B", "B" -> "C", "D" -> "C")).toSet
    assert(got == Set("A" -> "B", "A" -> "C", "B" -> "C", "D" -> "C"))
  }

  test("subClassClosure fails fast on a cycle") {
    val ex = intercept[IllegalArgumentException] {
      Rdfs.subClassClosure(Seq("A" -> "B", "B" -> "A"))
    }
    assert(ex.getMessage.contains("cycle"))
  }

  test("inferTypes: explicit rdf:type, rdfs2 domain, rdfs3 range, rdfs9 lift") {
    val rel = Seq(
      ("alice", "type", "Admin"),    // explicit
      ("alice", "manages", "acme"),  // domain(manages)=Person, range=Org
      ("bob", "knows", "alice")      // domain(knows)=Person (no range axiom)
    ).toDF("s", "p", "o")
    val got = Rdfs.inferTypes(rel,
        subClass = Seq("Admin" -> "Person", "Person" -> "Agent"),
        domain = Seq("manages" -> "Person", "knows" -> "Person"),
        range = Seq("manages" -> "Org"))
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(got == Set(
      ("alice", "Admin"), ("alice", "Person"), ("alice", "Agent"),
      ("bob", "Person"), ("bob", "Agent"),
      ("acme", "Org")))
  }

  test("inferTypes is set-semantic: overlapping derivations collapse") {
    // alice is typed Person by BOTH the explicit triple and domain inference
    val rel = Seq(
      ("alice", "type", "Person"),
      ("alice", "knows", "bob")).toDF("s", "p", "o")
    val got = Rdfs.inferTypes(rel, subClass = Nil,
      domain = Seq("knows" -> "Person"), range = Nil)
    assert(got.count() == got.distinct().count())
    assert(got.collect().map(r => (r.getString(0), r.getString(2))).toSet ==
      Set(("alice", "Person")))
  }

  test("inferTypes with an empty schema is just the base facts") {
    val rel = Seq(("n1", "e", "n2")).toDF("s", "p", "o")
    val got = Rdfs.inferTypes(rel, subClass = Nil,
      domain = Seq("e" -> "Node"), range = Seq("e" -> "Node"))
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(got == Set(("n1", "Node"), ("n2", "Node")))
  }

  private def propRel = Seq(
    ("p1", "supplied_by", "s1"),
    ("s9", "supplies", "p9"),
    ("a", "near", "b"),
    ("x", "other", "y")).toDF("s", "p", "o")

  test("materializeProperties: inverseOf entails BOTH directions") {
    val got = Rdfs.materializeProperties(propRel,
        inverseOf = Seq("supplied_by" -> "supplies"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      ("p1", "supplied_by", "s1"), ("s1", "supplies", "p1"),
      ("s9", "supplies", "p9"), ("p9", "supplied_by", "s9"),
      ("a", "near", "b"), ("x", "other", "y")))
  }

  test("materializeProperties: symmetric property mirrors its edges") {
    val got = Rdfs.materializeProperties(propRel, symmetric = Seq("near"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got.contains(("b", "near", "a")) && got.contains(("a", "near", "b")))
    assert(!got.contains(("y", "other", "x")))
  }

  test("materializeProperties is idempotent (set semantics)") {
    val once = Rdfs.materializeProperties(propRel,
      inverseOf = Seq("supplied_by" -> "supplies"), symmetric = Seq("near"))
    val twice = Rdfs.materializeProperties(once,
      inverseOf = Seq("supplied_by" -> "supplies"), symmetric = Seq("near"))
    assert(once.count() == twice.count())
  }
}
