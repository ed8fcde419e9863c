package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.PairExplode

class PairExplodeRulesSpec extends AnyFunSuite with graft.SparkTestSession {

  private def rolled = {
    import spark.implicits._
    Seq(
      (1L, Seq((0, "a", "T", 10L), (3, "b", "T", 11L), (30, "c", "T", 12L), (40, "d", "T", 13L))),
      (2L, Seq((5, "x", "T", 20L), (6, "y", "T", 21L))))
      .toDF("doc_id", "ms0")
      .select(col("doc_id"), col("ms0").cast(
        "array<struct<ind:int,value:string,type:string,group_id:bigint>>").as("ms"))
  }

  private def pairsWithFilter(k: Int) = rolled
    .select(col("doc_id"), PairExplode.explode_pairs(col("ms"), lit(50)).as(
      Seq("s_ind", "t_ind", "s_value", "t_value", "s_type", "t_type")))
    .filter(abs(col("s_ind") - col("t_ind")) <= k)

  test("rule tightens the generator bound from the enclosing distance filter") {
    GraftOptimizations.enable(spark)
    val df = pairsWithFilter(5)
    val optimized = df.queryExecution.optimizedPlan
    val bounds = optimized.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate =>
        g.generator.asInstanceOf[PairExplode].bound
    }
    assert(bounds.nonEmpty)
    assert(bounds.forall(_ == org.apache.spark.sql.catalyst.expressions.Literal(5)),
      s"generator bound not tightened: $bounds\n$optimized")
    // correctness: same rows as the un-tightened semantics
    val got = df.select("doc_id", "s_ind", "t_ind").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == Set((1L, 0, 3), (1L, 3, 0), (2L, 5, 6), (2L, 6, 5)))
  }

  test("rule leaves looser or non-distance filters alone") {
    GraftOptimizations.enable(spark)
    // looser than the generator's own bound: unchanged
    val loose = pairsWithFilter(99).queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate =>
        g.generator.asInstanceOf[PairExplode].bound
    }
    assert(loose.forall(_ == org.apache.spark.sql.catalyst.expressions.Literal(50)))
    // unrelated predicate: unchanged, rows intact
    val other = rolled
      .select(col("doc_id"), PairExplode.explode_pairs(col("ms"), lit(50)).as(
        Seq("s_ind", "t_ind", "s_value", "t_value", "s_type", "t_type")))
      .filter(col("s_value") =!= "zzz")
    val b2 = other.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate =>
        g.generator.asInstanceOf[PairExplode].bound
    }
    assert(b2.forall(_ == org.apache.spark.sql.catalyst.expressions.Literal(50)))
    assert(other.count() > 4) // within-50 pairs of doc 1 + doc 2
  }

  test("conjunction: tightest distance conjunct wins, other conjuncts still applied") {
    GraftOptimizations.enable(spark)
    val df = rolled
      .select(col("doc_id"), PairExplode.explode_pairs(col("ms"), lit(50)).as(
        Seq("s_ind", "t_ind", "s_value", "t_value", "s_type", "t_type")))
      .filter(abs(col("s_ind") - col("t_ind")) <= 10 &&
        abs(col("s_ind") - col("t_ind")) <= 3 && col("s_value") =!= "y")
    val bounds = df.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate =>
        g.generator.asInstanceOf[PairExplode].bound
    }
    assert(bounds.forall(_ == org.apache.spark.sql.catalyst.expressions.Literal(3)))
    val got = df.select("doc_id", "s_ind", "t_ind").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == Set((1L, 0, 3), (1L, 3, 0), (2L, 5, 6))) // (2,6,5) removed: s_value == "y"
  }
}
