package graft.functions

import org.apache.spark.sql.{Column, GraftInternal}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dense-vector primitives over `array<float>` embedding columns.
  *
  * Dot product / cosine are custom codegen'd Catalyst expressions: the
  * built-in composition (`aggregate(zip_with(...))`) materializes a zipped
  * intermediate array per row-pair, which is exactly the allocation you
  * cannot afford inside an ANN join at scale. The expression form is a tight
  * primitive-typed loop inside whole-stage codegen.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    GraftInternal.column(
      DotProductExpression(GraftInternal.expression(a), GraftInternal.expression(b)))

  /** Dot product over `array<double>` columns — same left-to-right
    * accumulation order as `aggregate(zip_with(a, b, _*_), 0.0, _+_)`, so
    * results are bit-identical to the fold (and to the DuckDB oracle's
    * `list_sum(list_transform(...))`), without the zipped intermediate
    * array the built-in composition allocates per pair. */
  def dotD(a: Column, b: Column): Column =
    GraftInternal.column(
      DotProductDoubleExpression(GraftInternal.expression(a), GraftInternal.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column =
    GraftInternal.column(
      CosineExpression(GraftInternal.expression(a), GraftInternal.expression(b)))

  /** Sign bits of `nBits` fixed random-hyperplane projections, packed into a
    * long — the SRP-LSH bucket key for cosine similarity (Charikar 2002).
    * Hyperplane components are deterministic pseudo-randoms derived from
    * (bit, dim) by splitmix64, so every executor derives the same planes
    * without shipping a matrix. */
  def srpBucket(a: Column, nBits: Int): Column =
    GraftInternal.column(SrpBucketExpression(GraftInternal.expression(a), nBits))

  // ---- static helpers callable from generated code ----

  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def dotDF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic N(0,1)-ish hyperplane component for (bit, dim). */
  def plane(bit: Int, dim: Int): Double = {
    val h = splitmix64(bit.toLong * 1000003L + dim)
    // map to [-1, 1); symmetric, fixed — adequate for SRP sign tests
    (h >> 11).toDouble / (1L << 52).toDouble
  }

  def srp(a: ArrayData, nBits: Int): Long = {
    val d = a.numElements()
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      var s = 0.0
      var i = 0
      while (i < d) { s += a.getFloat(i).toDouble * plane(b, i); i += 1 }
      if (s >= 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }
}

case class DotProductExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorFunctions.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorFunctions.dotF($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class DotProductDoubleExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot_d"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorFunctions.dotDF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorFunctions.dotDF($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class CosineExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorFunctions.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorFunctions.cosineF($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class SrpBucketExpression(child: Expression, nBits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "srp_bucket"
  override def nullSafeEval(input: Any): Any =
    VectorFunctions.srp(input.asInstanceOf[ArrayData], nBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorFunctions.srp($c, $nBits)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
