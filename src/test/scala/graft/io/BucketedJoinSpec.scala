package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Demonstrates the bucketing scale technique for co-located joins (the
  * builder-prompt "repartition()/bucketing for co-located joins" requirement):
  * writing both join sides bucketed BY THE JOIN KEY with the same bucket count
  * lets Spark's bucketed scan satisfy the join's required distribution —
  * no shuffle exchange on either side of the sort-merge join. At 100 TB this
  * is how the triples/edges tables are stored so graph self-joins (2-hop
  * paths, samples⨝predictions by id) never re-shuffle the fact table. */
class BucketedJoinSpec extends AnyFunSuite with graft.SparkTestSession {

  test("bucketed self-join plans with ZERO shuffle exchanges; same result as unbucketed") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("bucket-wh").toString
    spark.sql("DROP TABLE IF EXISTS edges_by_target")
    spark.sql("DROP TABLE IF EXISTS edges_by_source")
    val edges = (1 to 200).map { i => (s"n${i % 20}", s"n${(i * 7) % 20}", if (i % 3 == 0) "pos" else "neg", i.toDouble) }
      .toDF("source", "target", "sent", "c")
    // bucket BOTH join columns' tables by their join key, same bucket count
    // (explicit external paths — the warehouse dir is a static conf)
    edges.write.bucketBy(8, "target").sortBy("target").mode("overwrite")
      .option("path", s"$wh/edges_by_target").saveAsTable("edges_by_target")
    edges.write.bucketBy(8, "source").sortBy("source").mode("overwrite")
      .option("path", s"$wh/edges_by_source").saveAsTable("edges_by_source")

    val e1 = spark.table("edges_by_target")
    val e2 = spark.table("edges_by_source")
    val paths = e1.join(e2, e1("target") === e2("source"))
      .select(e1("source").as("a"), e1("target").as("b"), e2("target").as("c"))

    val plan = paths.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle either side:\n$plan")

    // identical result to the plain (shuffling) join
    val plain = edges.as("x").join(edges.as("y"), col("x.target") === col("y.source"))
      .select(col("x.source").as("a"), col("x.target").as("b"), col("y.target").as("c"))
    assert(paths.collect().map(_.toString).sorted.toSeq ==
      plain.collect().map(_.toString).sorted.toSeq)
    spark.sql("DROP TABLE IF EXISTS edges_by_target")
    spark.sql("DROP TABLE IF EXISTS edges_by_source")
  }
}
