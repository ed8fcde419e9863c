package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst `Generator` exposing the engine's pair-candidate operator (J1+F1,
  * SURVEY.md §4 item 2) to SQL:
  *
  *   SELECT explode_pairs(mentions, 50) FROM parsed
  *
  * where `mentions` is array<struct<ind int, value string, type string,
  * group_id bigint>>. Emits one row per ORDERED pair of distinct mentions in
  * different groups with |a.ind - b.ind| <= bound — the distance predicate is
  * fused INSIDE the generator, so no pair beyond the bound is ever
  * materialized (the Rule-pushdown the reference's semantics would otherwise
  * need). Row-local: no shuffle, composes with any per-sentence relation.
  */
case class PairExplode(mentions: Expression, bound: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(mentions, bound)

  private val mentionStruct = StructType(Seq(
    StructField("ind", IntegerType), StructField("value", StringType),
    StructField("type", StringType), StructField("group_id", LongType)))

  override def checkInputDataTypes(): TypeCheckResult = mentions.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 4 && s(0).dataType == IntegerType && s(1).dataType == StringType &&
          s(2).dataType == StringType && s(3).dataType == LongType =>
      if (bound.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("bound must be int")
    case other => TypeCheckResult.TypeCheckFailure(
      s"explode_pairs expects array<struct<ind int, value string, type string, group_id bigint>>, got $other")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("s_ind", IntegerType, nullable = false),
    StructField("t_ind", IntegerType, nullable = false),
    StructField("s_value", StringType),
    StructField("t_value", StringType),
    StructField("s_type", StringType),
    StructField("t_type", StringType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = mentions.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Nil
    val b = bound.eval(input).asInstanceOf[Int]
    val n = arr.numElements()
    val rows = Seq.newBuilder[InternalRow]
    var i = 0
    while (i < n) {
      val mi = arr.getStruct(i, 4)
      val indI = mi.getInt(0); val gI = mi.getLong(3)
      var j = 0
      while (j < n) {
        if (i != j) {
          val mj = arr.getStruct(j, 4)
          if (gI != mj.getLong(3) && math.abs(indI - mj.getInt(0)) <= b) {
            rows += InternalRow(
              indI, mj.getInt(0),
              mi.getUTF8String(1), mj.getUTF8String(1),
              mi.getUTF8String(2), mj.getUTF8String(2))
          }
        }
        j += 1
      }
      i += 1
    }
    rows.result()
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(mentions = c(0), bound = c(1))
}

object PairExplode {
  def explode_pairs(mentions: Column, bound: Column): Column =
    org.apache.spark.sql.graft.bridge.column(PairExplode(
      org.apache.spark.sql.graft.bridge.expression(mentions),
      org.apache.spark.sql.graft.bridge.expression(bound)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "explode_pairs", exprs => PairExplode(exprs(0), exprs(1)), "scala_udf")
}
