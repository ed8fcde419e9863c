package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

class ScaleUpSpec extends AnyFunSuite with SparkTestSession {

  private lazy val outDir = {
    val d = java.nio.file.Files.createTempDirectory("scaleup").toString
    ScaleUp.scale(spark, "/root/testdata/sf0.001", d, 3)
    d
  }

  test("every table is factor x rows except shared dimensions") {
    def n(dir: String, t: String) = spark.read.parquet(s"$dir/$t.parquet").count()
    for (t <- Seq("documents", "embeddings", "events", "lineitem", "orders",
        "customer", "supplier", "part"))
      assert(n(outDir, t) == 3 * n("/root/testdata/sf0.001", t), t)
    for (t <- Seq("nation", "region"))
      assert(n(outDir, t) == n("/root/testdata/sf0.001", t), t)
  }

  test("replica keys are disjoint; replica 0 is the identity subset") {
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
    assert(docs.select("doc_id").distinct().count() == docs.count())
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val joined = docs.join(base.select(col("doc_id"), col("text").as("t0")), "doc_id")
    assert(joined.count() == base.count())
    assert(joined.filter(col("text") =!= col("t0")).count() == 0)
  }

  test("foreign keys stay consistent within replicas (orders -> customer, lineitem -> orders)") {
    val o = spark.read.parquet(s"$outDir/orders.parquet")
    val c = spark.read.parquet(s"$outDir/customer.parquet")
    assert(o.join(c, o("o_custkey") === c("c_custkey"), "left_anti").count() == 0)
    val l = spark.read.parquet(s"$outDir/lineitem.parquet")
    assert(l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti").count() == 0)
  }

  test("replica texts are near-duplicates but not exact duplicates") {
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
    // exact dedup finds no cross-replica duplicates (suffix token differs)
    assert(docs.groupBy(md5(col("text").cast("binary"))).count()
      .filter(col("count") > 1).count() == 0)
  }

  test("generation is deterministic") {
    val d2 = java.nio.file.Files.createTempDirectory("scaleup2").toString
    ScaleUp.scale(spark, "/root/testdata/sf0.001", d2, 3)
    def dump(dir: String) = spark.read.parquet(s"$dir/documents.parquet")
      .collect().map(_.toString).sorted.toSeq
    assert(dump(d2) == dump(outDir))
  }
}
