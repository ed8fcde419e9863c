package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

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
  *
  * Codegen: a `CollectionGenerator` (inline array<struct> shape, like Spark's
  * own `Inline`), NOT CodegenFallback — `doGenCode` emits one call to the
  * static [[PairExplode.compute]] kernel shared with the interpreted path, so
  * GenerateExec keeps the surrounding whole-stage-codegen span intact and the
  * O(n·window) pair loop runs as plain JVM code either way.
  */
case class PairExplode(mentions: Expression, bound: Expression)
    extends Generator with CollectionGenerator {

  override def children: Seq[Expression] = Seq(mentions, bound)

  override val inline: Boolean = true
  override val position: Boolean = false
  override def collectionType: DataType = ArrayType(elementSchema, containsNull = false)

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
    val out = PairExplodeKernel.compute(
      mentions.eval(input).asInstanceOf[ArrayData],
      bound.eval(input).asInstanceOf[java.lang.Integer])
    (0 until out.numElements()).map(i => out.getStruct(i, 6))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = mentions.genCode(ctx)
    val b = bound.genCode(ctx)
    val arrCls = classOf[ArrayData].getName
    // standalone object => static forwarders exist for Janino to call
    val kernel = "graft.functions.PairExplodeKernel"
    ev.copy(
      code = code"""
        |${m.code}
        |${b.code}
        |$arrCls ${ev.value} = $kernel.compute(
        |  ${m.isNull} ? null : ${m.value},
        |  ${b.isNull} ? null : (Integer) ${b.value});
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(mentions = c(0), bound = c(1))
}

/** Standalone holder (NOT the case-class companion: companion objects get no
  * static forwarders, and the generated code calls this as a plain Java
  * static). */
object PairExplodeKernel {

  private val Empty: ArrayData = new GenericArrayData(Array.empty[Any])

  /** The pair-generation kernel — static, shared by the interpreted `eval`
    * and the generated code (called from Janino-compiled sources, hence the
    * Java-friendly boxed signature). Returns an array of 6-field rows. */
  def compute(arr: ArrayData, bound: java.lang.Integer): ArrayData = {
    if (arr == null || bound == null) return Empty
    val b = bound.intValue()
    val n = arr.numElements()
    if (n < 2) return Empty
    val rows = new scala.collection.mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      val mi = arr.getStruct(i, 4)
      val indI = mi.getInt(0); val gI = mi.getLong(3)
      var j = 0
      while (j < n) {
        if (i != j) {
          val mj = arr.getStruct(j, 4)
          if (gI != mj.getLong(3) && math.abs(indI - mj.getInt(0)) <= b) {
            rows += new GenericInternalRow(Array[Any](
              indI, mj.getInt(0),
              mi.getUTF8String(1), mj.getUTF8String(1),
              mi.getUTF8String(2), mj.getUTF8String(2)))
          }
        }
        j += 1
      }
      i += 1
    }
    if (rows.isEmpty) Empty else new GenericArrayData(rows.toArray)
  }
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
