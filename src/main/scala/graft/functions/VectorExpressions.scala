package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the ANN hot loop: sequential-fold cosine
  * similarity over two array<double> columns.
  *
  * Why a custom Expression (SURVEY.md §2.9 preference order b): the
  * `aggregate(zip_with(...))` formulation is a higher-order function —
  * interpreted, per-element lambda dispatch, boxing. This expression is a
  * tight primitive loop with whole-stage codegen (`doGenCode`), while keeping
  * the EXACT same float semantics (left-to-right fold, doubles) so results
  * stay bit-identical to the DuckDB oracle and the HOF formulation.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects array<double>, got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    // remaining tail contributes to the norms only (defensive; equal dims in practice)
    var j = n
    while (j < x.numElements()) { val v = x.getDouble(j); nx += v * v; j += 1 }
    j = n
    while (j < y.numElements()) { val v = y.getDouble(j); ny += v * v; j += 1 }
    dot / math.sqrt(nx) / math.sqrt(ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val v = ctx.freshName("v")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = $a.getDouble($i); double y = $b.getDouble($i);
         |  $dot += x * y; $nx += x * x; $ny += y * y;
         |}
         |for (int $i = $n; $i < $a.numElements(); $i++) {
         |  double $v = $a.getDouble($i); $nx += $v * $v;
         |}
         |for (int $i = $n; $i < $b.numElements(); $i++) {
         |  double $v = $b.getDouble($i); $ny += $v * $v;
         |}
         |${ev.value} = $dot / java.lang.Math.sqrt($nx) / java.lang.Math.sqrt($ny);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorExpressions {

  /** Column API: cosine_similarity(a, b) over array<double> (cast upstream). */
  def cosine_similarity(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.bridge.column(CosineSimilarity(
      org.apache.spark.sql.graft.bridge.expression(a),
      org.apache.spark.sql.graft.bridge.expression(b)))

  /** SQL registration: SELECT cosine_similarity(a, b). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")

  /** Register every engine SQL function on a session. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    register(spark)
    PairExplode.register(spark)
  }
}
