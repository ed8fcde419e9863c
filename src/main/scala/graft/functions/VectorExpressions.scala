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

/** Native random-hyperplane LSH signature: one string of sign bits per band
  * (bit k = sign of the sequential-fold dot ⟨vec, plane_k⟩ — bit-identical to
  * the `aggregate(zip_with(...))` HOF formulation and the DuckDB oracle, but a
  * tight primitive loop inside whole-stage codegen instead of K interpreted
  * higher-order functions per row; at 10^9 vectors the K×D multiply-adds are
  * the signature stage's entire cost). The plane matrix rides along as a
  * codegen reference object, not generated source. */
case class HyperplaneSig(child: Expression, planes: Array[Array[Double]], rowsPerBand: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(planes.nonEmpty && planes.length % rowsPerBand == 0,
    "planes count must be a positive multiple of rowsPerBand")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hyperplane_sig expects array<double>, got $t")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "hyperplane_sig"

  private lazy val flat: Array[Double] = planes.flatten
  private lazy val dim: Int = planes.head.length

  override def nullSafeEval(a: Any): Any =
    HyperplaneSig.compute(a.asInstanceOf[ArrayData], flat, dim, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", flat, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HyperplaneSig.compute($a, $planesRef, $dim, $rowsPerBand);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSig {
  /** Shared eval/codegen kernel. Sequential fold per plane over the first
    * min(dim, |vec|) elements — the exact HOF/oracle semantics. */
  def compute(vec: ArrayData, flat: Array[Double], dim: Int, rowsPerBand: Int): ArrayData = {
    val k = flat.length / dim
    val bands = k / rowsPerBand
    val n = math.min(vec.numElements(), dim)
    val out = new Array[AnyRef](bands)
    val sb = new java.lang.StringBuilder(rowsPerBand)
    var b = 0
    var kk = 0
    while (b < bands) {
      sb.setLength(0)
      var r = 0
      while (r < rowsPerBand) {
        val base = kk * dim
        var dot = 0.0
        var i = 0
        while (i < n) { dot += vec.getDouble(i) * flat(base + i); i += 1 }
        sb.append(if (dot > 0) '1' else '0')
        r += 1; kk += 1
      }
      out(b) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Native SimHash signature over a token array: one compiled pass computing
  * every bit, instead of `bits` interpreted HOF passes (aggregate+transform
  * don't codegen; at 64 bits the declarative form re-walks the token array 64
  * times per document — it benchmarked 27 s where this runs in ~1 s). Bit j
  * of the signature is the sign of the token-vote sum, where a token votes
  * +1/-1 by bit (j/32) of hex nibble (j%32) of md5(token) — bit-identical to
  * the declarative formulation in [[graft.ops.Dedup.simhashDeclarative]] and
  * the DuckDB oracle. */
case class SimhashSig(child: Expression, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(bits >= 1 && bits <= 128, s"bits=$bits outside [1, 128] (md5 width)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash_sig expects array<string>, got $t")
  }
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(a: Any): Any =
    SimhashSig.compute(a.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimhashSig.compute($a, $bits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashSig {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared eval/codegen kernel. A null token element poisons every bit to
    * '0' — the declarative aggregate's null fold does exactly that. */
  def compute(tokens: ArrayData, bits: Int): org.apache.spark.unsafe.types.UTF8String = {
    val out = new Array[Byte](bits)
    val n = tokens.numElements()
    val votes = new Array[Int](bits)
    val md = mdLocal.get()
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) {
        java.util.Arrays.fill(out, '0'.toByte)
        return org.apache.spark.unsafe.types.UTF8String.fromBytes(out)
      }
      md.reset()
      val h = md.digest(tokens.getUTF8String(i).getBytes)
      var j = 0
      while (j < bits) {
        val p = j & 31
        val nib = if ((p & 1) == 0) (h(p >> 1) >> 4) & 0xF else h(p >> 1) & 0xF
        votes(j) += (((nib >> (j >> 5)) & 1) << 1) - 1
        j += 1
      }
      i += 1
    }
    var j = 0
    while (j < bits) { out(j) = if (votes(j) > 0) '1'.toByte else '0'.toByte; j += 1 }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(out)
  }
}

/** Native k-means kernels over integer-quantized vectors (array<bigint>):
  * the K×D squared-L2 loop against a centroid matrix carried as a codegen
  * reference object. The HOF formulation (aggregate(zip_with) per centroid)
  * is interpreted AND its K big expression trees make every one of the
  * training loop's driver-synchronous jobs pay ~1s of Catalyst analysis —
  * the 8-centroid/64-dim training at sf0.1 ran 13 s with HOF trees vs ~3 s
  * with these single-node expressions. Integer arithmetic is
  * order-insensitive, so results are bit-identical to the HOF form and the
  * DuckDB oracle. */
object CentroidKernel {
  /** Vectors must match the centroid dimensionality exactly and contain no
    * nulls — the HOF formulation null-propagates a mismatch into a null cell
    * id, which would DIVERGE silently from this kernel's prefix arithmetic;
    * failing fast keeps the cross-engine parity contract honest. */
  private def checkShape(q: ArrayData, dim: Int): Unit = {
    if (q.numElements() != dim)
      throw new IllegalArgumentException(
        s"centroid kernel: vector has ${q.numElements()} elements, centroids have $dim")
    var i = 0
    while (i < dim) {
      if (q.isNullAt(i))
        throw new IllegalArgumentException(s"centroid kernel: null element at $i")
      i += 1
    }
  }

  /** Index of the nearest centroid (squared L2), ties to the smaller index. */
  def argmin(q: ArrayData, flat: Array[Long], dim: Int): Long = {
    checkShape(q, dim)
    val k = flat.length / dim
    var best = 0L; var bestD = Long.MaxValue
    var c = 0
    while (c < k) {
      val base = c * dim
      var d = 0L
      var i = 0
      while (i < dim) { val x = q.getLong(i) - flat(base + i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c.toLong }
      c += 1
    }
    best
  }

  /** Min squared L2 distance to any centroid (maximin seeding). */
  def minDist(q: ArrayData, flat: Array[Long], dim: Int): Long = {
    checkShape(q, dim)
    val k = flat.length / dim
    var bestD = Long.MaxValue
    var c = 0
    while (c < k) {
      val base = c * dim
      var d = 0L
      var i = 0
      while (i < dim) { val x = q.getLong(i) - flat(base + i); d += x * x; i += 1 }
      if (d < bestD) bestD = d
      c += 1
    }
    bestD
  }
}

abstract class CentroidExpr
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  def cents: Array[Array[Long]]
  protected lazy val flat: Array[Long] = cents.flatten
  protected lazy val dim: Int = cents.head.length
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<bigint>, got $t")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  protected def kernelName: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", flat, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CentroidKernel.$kernelName($a, $ref, $dim);")
  }
}

case class CentroidArgmin(child: Expression, cents: Array[Array[Long]]) extends CentroidExpr {
  override def prettyName: String = "centroid_argmin"
  override protected def kernelName: String = "argmin"
  override def nullSafeEval(a: Any): Any =
    CentroidKernel.argmin(a.asInstanceOf[ArrayData], flat, dim)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class CentroidMinDist(child: Expression, cents: Array[Array[Long]]) extends CentroidExpr {
  override def prettyName: String = "centroid_min_dist"
  override protected def kernelName: String = "minDist"
  override def nullSafeEval(a: Any): Any =
    CentroidKernel.minDist(a.asInstanceOf[ArrayData], flat, dim)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {

  /** Column API: nearest-centroid index over array<bigint> (ties -> smaller). */
  def centroid_argmin(q: Column, cents: Array[Array[Long]]): Column =
    org.apache.spark.sql.graft.bridge.column(CentroidArgmin(
      org.apache.spark.sql.graft.bridge.expression(q), cents))

  /** Column API: min squared L2 distance to any centroid over array<bigint>. */
  def centroid_min_dist(q: Column, cents: Array[Array[Long]]): Column =
    org.apache.spark.sql.graft.bridge.column(CentroidMinDist(
      org.apache.spark.sql.graft.bridge.expression(q), cents))

  /** Column API: native one-pass SimHash signature over array<string>. */
  def simhash_sig(toks: Column, bits: Int): Column =
    org.apache.spark.sql.graft.bridge.column(SimhashSig(
      org.apache.spark.sql.graft.bridge.expression(toks), bits))

  /** Column API: per-band hyperplane sign signatures over array<double>. */
  def hyperplane_sig(vec: Column, planes: Array[Array[Double]], rowsPerBand: Int): Column =
    org.apache.spark.sql.graft.bridge.column(HyperplaneSig(
      org.apache.spark.sql.graft.bridge.expression(vec), planes, rowsPerBand))

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
