package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.graph.GraphOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ComponentStoreSpec extends AnyFunSuite with SparkTestSession {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-compstore").toString

  private def rel(rows: (String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("source", "target")
  }

  private def labels(df: DataFrame): Map[String, String] =
    df.collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("incremental fold equals the one-shot connectedComponents") {
    val store = tmp()
    // batch 1: two separate components; batch 2: an edge BRIDGING them plus
    // a fresh component — the fold must re-label the merged component to the
    // global min without replaying batch-1 edges
    assert(ComponentStore.merge(rel(("B", "A"), ("X", "Y")), store, "b1"))
    assert(labels(ComponentStore.state(spark, store)) ==
      Map("A" -> "A", "B" -> "A", "X" -> "X", "Y" -> "X"))
    assert(ComponentStore.merge(rel(("Y", "B"), ("P", "Q")), store, "b2"))
    val all = rel(("B", "A"), ("X", "Y"), ("Y", "B"), ("P", "Q"))
      .withColumn("c", lit(1.0))
    assert(labels(ComponentStore.state(spark, store)) ==
      labels(GraphOps.connectedComponents(all)))
    assert(labels(ComponentStore.state(spark, store))("Y") == "A")
  }

  test("self-loops carry no connectivity; duplicate edges collapse") {
    val store = tmp()
    assert(ComponentStore.merge(
      rel(("Z", "Z"), ("A", "B"), ("B", "A"), ("A", "B")), store, "b1"))
    assert(labels(ComponentStore.state(spark, store)) == Map("A" -> "A", "B" -> "A"))
  }

  test("idempotent retry: a re-driven batchId is a no-op") {
    val store = tmp()
    assert(ComponentStore.merge(rel(("A", "B")), store, "batch-1"))
    assert(!ComponentStore.merge(rel(("C", "D")), store, "batch-1")) // ledger hit
    assert(labels(ComponentStore.state(spark, store)) == Map("A" -> "A", "B" -> "A"))
    assert(ComponentStore.mergedBatches(spark, store) == Set("batch-1"))
  }

  test("crash between the two swap renames recovers on next entry") {
    val store = tmp()
    assert(ComponentStore.merge(rel(("A", "B")), store, "b1"))
    val dir = java.nio.file.Paths.get(store)
    java.nio.file.Files.move(dir.resolve("state"), dir.resolve("state.merge-bak"))
    assert(ComponentStore.mergedBatches(spark, store) == Set("b1")) // recovered
    assert(ComponentStore.merge(rel(("B", "C")), store, "b2"))
    assert(labels(ComponentStore.state(spark, store)) ==
      Map("A" -> "A", "B" -> "A", "C" -> "A"))
  }

  test("batchId hygiene: empty or multi-line ids are rejected") {
    val store = tmp()
    intercept[IllegalArgumentException] { ComponentStore.merge(rel(("A", "B")), store, " ") }
    intercept[IllegalArgumentException] { ComponentStore.merge(rel(("A", "B")), store, "a\nb") }
  }
}
