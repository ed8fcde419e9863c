package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KgEmbedSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val edges = Seq(
    ("a", "r1", "b"), ("a", "r1", "c"), ("b", "r2", "c"), ("c", "r1", "d"),
    ("d", "r2", "a"), ("e", "r1", "a"), ("b", "r1", "e"), ("e", "r2", "d"))
    .toDF("source", "sent", "target")

  test("negativeTails: corruptions are vocabulary members and never true edges") {
    val neg = KgEmbed.negativeTails(edges, seed = 3L, buckets = 4)
      .as[(String, String, String, String)].collect().toList
    assert(neg.nonEmpty)
    val vocab = Set("a", "b", "c", "d", "e")
    val trueEdges = edges.as[(String, String, String)].collect()
      .map { case (s, r, t) => (s, r, t) }.toSet
    neg.foreach { case (s, r, t, tn) =>
      assert(vocab.contains(tn), s"corruption $tn outside vocabulary")
      assert(!trueEdges.contains((s, r, tn)),
        s"filtered setting violated: ($s,$r,$tn) is a true edge")
      assert(tn !== t, "corruption equals the true tail (itself a true edge)")
      assert(trueEdges.contains((s, r, t)), "output row lost its true triple")
    }
    // at most one corruption per distinct true edge
    assert(neg.map { case (s, r, t, _) => (s, r, t) }.distinct.size === neg.size)
  }

  test("negativeTails: deterministic under repartitioning and repeated runs") {
    val a = KgEmbed.negativeTails(edges, seed = 3L, buckets = 4)
      .as[(String, String, String, String)].collect().toSet
    val b = KgEmbed.negativeTails(edges.repartition(13), seed = 3L, buckets = 4)
      .as[(String, String, String, String)].collect().toSet
    assert(a === b)
    // a different seed still yields only vocabulary-member corruptions
    val c = KgEmbed.negativeTails(edges, seed = 4L, buckets = 4)
      .as[(String, String, String, String)].collect().toList
    assert(c.forall { case (_, _, _, tn) => Set("a", "b", "c", "d", "e").contains(tn) })
  }

  test("negativeTails: duplicate observations collapse to the distinct edge set") {
    val dup = edges.union(edges)
    val a = KgEmbed.negativeTails(edges, seed = 3L, buckets = 4)
      .as[(String, String, String, String)].collect().toSet
    val b = KgEmbed.negativeTails(dup, seed = 3L, buckets = 4)
      .as[(String, String, String, String)].collect().toSet
    assert(a === b)
  }
}
