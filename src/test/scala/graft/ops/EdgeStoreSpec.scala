package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.graph.GraphBuilder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class EdgeStoreSpec extends AnyFunSuite with SparkTestSession {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-edgestore").toString

  /** Raw keyed relation rows (source, target, sent). */
  private def rel(rows: (String, String, Int)*): DataFrame = {
    import spark.implicits._
    rows.toDF("source", "target", "sent")
  }

  private def edgeSet(df: DataFrame): Set[(String, String, Int, Double)] =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getDouble(3))).toSet

  test("merge + edges: min-links HAVING applies at read, not per batch") {
    val store = tmp()
    // edge (A,B,0) appears once per batch — a per-batch filter at minLinks=2
    // would lose it; the store must keep unfiltered counts.
    assert(EdgeStore.merge(GraphBuilder.edgeState(
      rel(("A", "B", 0), ("C", "D", 1))), store, "b1"))
    assert(EdgeStore.merge(GraphBuilder.edgeState(
      rel(("A", "B", 0), ("E", "F", 0))), store, "b2"))
    assert(edgeSet(EdgeStore.edges(spark, store, minLinks = 2)) ==
      Set(("A", "B", 0, 2.0)))
    // weights off: surviving edges carry c=1.0
    assert(edgeSet(EdgeStore.edges(spark, store, minLinks = 2, weights = false)) ==
      Set(("A", "B", 0, 1.0)))
    // minLinks=1 sees everything
    assert(EdgeStore.edges(spark, store).count() == 3)
  }

  test("store-backed merges reproduce the one-shot GraphBuilder.edges") {
    val store = tmp()
    val all = rel(("A", "B", 0), ("A", "B", 0), ("B", "C", 1), ("A", "B", 1),
      ("C", "A", 0), ("B", "C", 1), ("A", "B", 0))
    val parts = Seq(all.limit(3), all.offset(3))
    // offset/limit split: fold each part separately
    assert(EdgeStore.merge(GraphBuilder.edgeState(all.limit(3)), store, "p0"))
    assert(EdgeStore.merge(GraphBuilder.edgeState(all.offset(3)), store, "p1"))
    assert(edgeSet(EdgeStore.edges(spark, store, minLinks = 2)) ==
      edgeSet(GraphBuilder.edges(all, minLinks = 2)))
    assert(parts.size == 2)
  }

  test("idempotent retry: a re-driven batchId is a no-op") {
    val store = tmp()
    val d = GraphBuilder.edgeState(rel(("A", "B", 0)))
    assert(EdgeStore.merge(d, store, "batch-1"))
    assert(!EdgeStore.merge(d, store, "batch-1")) // retry: ledger hit
    assert(EdgeStore.edges(spark, store).agg(sum("c")).head.getDouble(0) == 1.0)
    assert(EdgeStore.mergedBatches(spark, store) == Set("batch-1"))
  }

  test("crash between the two swap renames recovers on next entry") {
    val store = tmp()
    assert(EdgeStore.merge(GraphBuilder.edgeState(rel(("A", "B", 0))), store, "b1"))
    // simulate: live renamed to .merge-bak, new state lost before its rename
    val dir = java.nio.file.Paths.get(store)
    java.nio.file.Files.move(dir.resolve("state"), dir.resolve("state.merge-bak"))
    assert(EdgeStore.mergedBatches(spark, store) == Set("b1")) // recovered
    assert(EdgeStore.edges(spark, store).count() == 1)
    // and the interrupted batch can be re-driven exactly once
    assert(EdgeStore.merge(GraphBuilder.edgeState(rel(("A", "B", 0))), store, "b2"))
    assert(EdgeStore.edges(spark, store, minLinks = 2).count() == 1)
  }

  test("batchId hygiene: empty or multi-line ids are rejected") {
    val store = tmp()
    val d = GraphBuilder.edgeState(rel(("A", "B", 0)))
    intercept[IllegalArgumentException] { EdgeStore.merge(d, store, "  ") }
    intercept[IllegalArgumentException] { EdgeStore.merge(d, store, "a\nb") }
  }

  test("per-predicate planning stats ride the swap and invalidate per merge") {
    val store = tmp()
    EdgeStore.merge(GraphBuilder.edgeState(
      rel(("A", "B", 0), ("C", "D", 0), ("E", "F", 1))), store, "b1")
    val Some((m1, t1)) = EdgeStore.stats(spark, store)
    assert(m1 == Map("0" -> 2L, "1" -> 1L) && t1 == 3L)
    // a second merge rewrites the stats atomically with the state
    EdgeStore.merge(GraphBuilder.edgeState(rel(("G", "H", 1))), store, "b2")
    val Some((m2, t2)) = EdgeStore.stats(spark, store)
    assert(m2 == Map("0" -> 2L, "1" -> 2L) && t2 == 4L)
    // and planning from them is pure driver-side — no relation argument
    import graft.ops.Bgp.Pat
    val planned = graft.ops.Bgp.planPatternsCached(m2, t2,
      Seq(Pat("?x", "0", "?y"), Pat("?y", "1", "?z")))
    assert(planned.map(_.p) == Seq("0", "1")) // tie (2 vs 2) -> input order
  }
}
