package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.graph.GraphOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hand-computed cases for the round's new operators: sorted-neighborhood
  * ER blocking, winnowing fingerprints, bounded bow-tie decomposition, and
  * inverse functionality (the cross-engine oracles pin corpus-scale
  * behavior; these pin arithmetic and edge cases). */
class SnWinnowBowtieSpec extends AnyFunSuite with SparkTestSession {

  test("sortedNeighborhood: pairs are exactly the w-window of the sort order") {
    import spark.implicits._
    // sort order by key then id: (b,2) (b,5) (c,1) (d,9) -> ranks 0..3
    val df = Seq((1L, "c"), (2L, "b"), (5L, "b"), (9L, "d")).toDF("id", "k")
    val got = Dedup.sortedNeighborhood(df, col("k"), col("id"), w = 3)
      .select("a_id", "b_id", "gap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // gaps 1 and 2 from each rank: (2,5),(2,1),(5,1),(5,9),(1,9)
    assert(got == Set((2L, 5L, 1L), (2L, 1L, 2L), (5L, 1L, 1L),
      (5L, 9L, 2L), (1L, 9L, 1L)))
  }

  test("sortedNeighborhood: deterministic across partitionings; null keys sort first") {
    import spark.implicits._
    val rows = (1L to 40L).map(i => (i, if (i % 7 == 0) null else s"k${i % 5}"))
    val a = Dedup.sortedNeighborhood(rows.toDF("id", "k").repartition(1),
      col("k"), col("id"), w = 4).collect().map(_.toSeq).toSet
    val b = Dedup.sortedNeighborhood(rows.toDF("id", "k").repartition(13),
      col("k"), col("id"), w = 4).collect().map(_.toSeq).toSet
    assert(a == b)
    // N*(w-1) minus the truncated tail windows: 40*3 - (3+2+1)
    assert(a.size == 40 * 3 - 6)
  }

  test("winnowing: guarantee — shared run of >= k+w-1 tokens shares a fingerprint") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta" // 7 tokens = k+w-1 at k=w=4
    val df = Seq((1L, s"one two $shared"), (2L, s"$shared nine ten")).toDF("id", "text")
    val fps = TextStats.winnowing(df, col("text"), col("id"), k = 4, w = 4)
    val byDoc = fps.collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(2)).toSet)
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty)
  }

  test("winnowing: short doc (fewer than w grams) still emits one fingerprint") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e")).toDF("id", "text") // 2 grams at k=4 < w
    val got = TextStats.winnowing(df, col("text"), col("id"), k = 4, w = 4).collect()
    assert(got.length == 1) // the single all-gram window selects one hash
  }

  test("winnowing: density is ~2/(w+1) and every selected pos holds the window min") {
    import spark.implicits._
    val text = (1 to 400).map(i => s"t${(i * 2654435761L) % 997}").mkString(" ")
    val df = Seq((1L, text)).toDF("id", "text")
    val sel = TextStats.winnowing(df, col("text"), col("id"), k = 4, w = 8).collect()
    val m = 400 - 3 // grams
    val density = sel.length.toDouble / m
    assert(density > 1.0 / 8 && density < 3.0 / 8, s"density $density")
  }

  test("bowTie: classic bow-tie graph classifies IN/CORE/OUT/OTHER") {
    import spark.implicits._
    // pivot = min id "a". core cycle a<->b; i1,i2 -> a (IN); b -> o1,o2 (OUT);
    // x -> y disconnected (OTHER)
    val e = Seq(("a", "b"), ("b", "a"), ("i1", "a"), ("i2", "a"),
      ("b", "o1"), ("b", "o2"), ("x", "y")).toDF("source", "target")
      .withColumn("c", lit(1.0))
    val got = GraphOps.bowTie(e, rounds = 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("CORE" -> 2L, "IN" -> 2L, "OUT" -> 2L, "OTHER" -> 2L))
  }

  test("bowTie: radius bound is conservative — beyond `rounds` hops falls to OTHER") {
    import spark.implicits._
    // chain core -> c1 -> c2 -> c3 with rounds=2: c3 is beyond the bound
    val e = Seq(("a", "b"), ("b", "a"), ("a", "c1"), ("c1", "c2"), ("c2", "c3"))
      .toDF("source", "target").withColumn("c", lit(1.0))
    val got = GraphOps.bowTie(e, rounds = 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got("CORE") == 2L && got("OUT") == 2L && got("OTHER") == 1L)
  }

  test("inverseFunctionality: swapped roles count distinct subjects per object") {
    import spark.implicits._
    val rel = Seq(
      ("likes", "s1", "o1"), ("likes", "s2", "o1"), ("likes", "s3", "o2"),
      ("born_in", "s1", "c1"), ("born_in", "s2", "c2")
    ).toDF("sent", "source", "target")
    val inv = DocKg.functionalityFromRelation(
      rel.select(col("sent"), col("target").as("source"), col("source").as("target")))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    // likes: o1 has 2 subjects (violating), o2 has 1 -> 2 objects, 1 functional
    assert(inv("likes") == ((2L, 1L, 1L)))    // n_objects, n_inv_functional, extra
    assert(inv("born_in") == ((2L, 2L, 0L)))  // both city objects unique
  }
}
