package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

class PairExplodeSpec extends AnyFunSuite with SparkTestSession {

  private def mentionsDf = {
    import spark.implicits._
    // (ind, value, type, group_id): 3 mentions, two of them same group
    Seq((1L, Seq((6, "usa", "GPE", 1L), (11, "keller", "PERSON", 2L), (12, "usa2", "GPE", 1L))),
        (2L, Seq((0, "a", "GPE", 10L), (60, "b", "GPE", 11L))))
      .toDF("doc_id", "ms")
      .select(col("doc_id"), col("ms").cast(
        "array<struct<ind:int,value:string,type:string,group_id:bigint>>").as("ms"))
  }

  test("explode_pairs: ordered pairs, distance bound fused, same-group excluded") {
    val out = mentionsDf
      .select(col("doc_id"), PairExplode.explode_pairs(col("ms"), lit(50)).as(
        Seq("s_ind", "t_ind", "s_value", "t_value", "s_type", "t_type")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3), r.getString(4)))
      .sortBy(t => (t._1, t._2, t._3))
    // doc 1: (6,11),(11,6),(11,12),(12,11) — (6,12)/(12,6) excluded (same group)
    assert(out.filter(_._1 == 1L).map(t => (t._2, t._3)).toSeq ==
      Seq((6, 11), (11, 6), (11, 12), (12, 11)))
    // doc 2: |0-60| > 50 -> nothing
    assert(!out.exists(_._1 == 2L))
  }

  test("SQL registration: SELECT explode_pairs(...) works via LATERAL VIEW shape") {
    PairExplode.register(spark)
    mentionsDf.createOrReplaceTempView("md")
    val n = spark.sql("SELECT doc_id, explode_pairs(ms, 50) FROM md").count()
    assert(n == 4)
  }

  test("generator is codegen-native: no CodegenFallback, Generate inside a codegen span") {
    val df = mentionsDf.select(col("doc_id"),
      PairExplode.explode_pairs(col("ms"), lit(50)).as(
        Seq("s_ind", "t_ind", "s_value", "t_value", "s_type", "t_type")))
    assert(!PairExplode(null, null).isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback])
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
    // GenerateExec participates in whole-stage codegen when the generator
    // supports codegen — the Generate node must sit under a WholeStageCodegen
    assert(raw"\*\(\d+\) Generate".r.findFirstIn(plan).nonEmpty, plan)
  }

  test("matches the engine's flatMap pair generation on the documents table") {
    val viaGen = graft.ops.DocKg.pairsViaGenerator(spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).sorted.toSeq
    val viaFlatMap = graft.ops.DocKg.pairs(spark, "/root/testdata/sf0.001")
      .withColumn("s_type", expr("CASE s_value WHEN 'spark' THEN 'ORG' WHEN 'customer' THEN 'PERSON' WHEN 'table' THEN 'LOC' WHEN 'stream' THEN 'GPE' END"))
      .withColumn("t_type", expr("CASE t_value WHEN 'spark' THEN 'ORG' WHEN 'customer' THEN 'PERSON' WHEN 'table' THEN 'LOC' WHEN 'stream' THEN 'GPE' END"))
      .drop("opinion_id")
      .collect().map(_.toString).sorted.toSeq
    assert(viaGen == viaFlatMap)
  }
}
