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
  /** Element-wise 6-dp rounding to `array<double>`, codegen'd — see
    * [[RoundVec6Expression]]. */
  def roundVec6(v: Column): Column =
    GraftInternal.column(RoundVec6Expression(GraftInternal.expression(v)))

  def dotD(a: Column, b: Column): Column =
    GraftInternal.column(
      DotProductDoubleExpression(GraftInternal.expression(a), GraftInternal.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column =
    GraftInternal.column(
      CosineExpression(GraftInternal.expression(a), GraftInternal.expression(b)))

  /** The `n` nearest centroids of a (6-dp-rounded) vector — squared-L2
    * ascending, centroid-id tie-break — as `array<int>`. The row-local
    * probe-list step of the DISTRIBUTED IVF-PQ path
    * ([[graft.pipeline.IvfPq.adcTopKDistributed]]): each query row
    * derives its own probe set with the coarse table as a plan
    * reference, no driver round-trip. */
  def centroidTopN(v: Column, centroids: Seq[Seq[Double]], n: Int): Column =
    GraftInternal.column(CentroidTopNExpression(
      GraftInternal.expression(v),
      centroids.map(_.toIndexedSeq).toIndexedSeq, n))

  /** Residual against a fitted centroid table: `v - centroids(cell)`,
    * element-wise raw IEEE subtraction (exactly replayable in SQL as
    * `v[i] - c[i]` — both engines subtract identical doubles). The
    * IVF-PQ encode step ([[graft.pipeline.IvfPq]]): quantize the
    * residual, not the vector. */
  def centroidResidual(
      v: Column, cell: Column, centroids: Seq[Seq[Double]]): Column =
    GraftInternal.column(CentroidResidualExpression(
      GraftInternal.expression(v), GraftInternal.expression(cell),
      centroids.map(_.toIndexedSeq).toIndexedSeq))

  /** Sign bits of `nBits` fixed random-hyperplane projections, packed into a
    * long — the SRP-LSH bucket key for cosine similarity (Charikar 2002).
    * Hyperplane components are deterministic pseudo-randoms derived from
    * (bit, dim) by splitmix64, so every executor derives the same planes
    * without shipping a matrix. */
  def srpBucket(a: Column, nBits: Int): Column =
    GraftInternal.column(SrpBucketExpression(GraftInternal.expression(a), nBits))

  /** Nearest-centroid id (squared-L2 argmin, first minimum wins → lowest
    * cluster id) over an `array<double>` column, with the k×dim centroid
    * table as ONE plan reference object.
    *
    * The declarative spelling — an `array(...)` of k
    * `aggregate(zip_with(v, typedlit(c), ...))` distance folds — builds a
    * plan tree LINEAR in k: at k in the hundreds (SemDeDup's k ∝ corpus
    * discipline) the driver burns minutes single-threaded in
    * analysis/optimization over thousands of literal nodes, and the
    * higher-order functions are CodegenFallback anyway. Here plan size is
    * O(1) in k and the scan stays in whole-stage codegen.
    *
    * Bit-compatible with the fold form: per-centroid distance accumulates
    * `(a-b)*(a-b)` left-to-right in element order (same IEEE sequence),
    * and the strict `<` scan keeps the FIRST minimum — exactly
    * `array_position(d, array_min(d)) - 1`. */
  def centroidArgmin(v: Column, centroids: Seq[Seq[Double]]): Column =
    GraftInternal.column(CentroidArgminExpression(
      GraftInternal.expression(v),
      centroids.map(_.toIndexedSeq).toIndexedSeq))

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

/** The centroid table + argmin loop, shipped once per task as a plan
  * reference object. Callable from generated code. */
final class CentroidTable(flat: Array[Double], k: Int, dim: Int)
    extends Serializable {
  /** First-minimum squared-L2 argmin; element order fixed left-to-right.
    * Malformed vectors fail LOUDLY: a short/long or null-holding vector
    * would otherwise be silently assigned a cluster from a partial
    * distance, where the declarative `zip_with` tree yields null and
    * drops the row — the bit-identical-equivalence contract requires
    * rejecting such rows, not guessing. */
  def argmin(v: ArrayData): Int = {
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"centroid_argmin: vector has ${v.numElements()} elements, " +
          s"centroids have dim $dim")
    var j = 0
    while (j < dim) {
      if (v.isNullAt(j))
        throw new IllegalArgumentException(
          s"centroid_argmin: null element at index $j")
      j += 1
    }
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < k) {
      val off = c * dim
      var s = 0.0
      var i = 0
      while (i < dim) {
        val d = v.getDouble(i) - flat(off + i)
        s += d * d
        i += 1
      }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  /** The `n` nearest centroid ids, squared-L2 ascending with id
    * tie-break (see [[VectorFunctions.centroidTopN]]) — selection sort
    * over the k distances (n ≪ k; k itself is metadata-scale). */
  def topN(v: ArrayData, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"centroid_topn: vector has ${v.numElements()} elements, " +
          s"centroids have dim $dim")
    val ds = new Array[Double](k)
    var c = 0
    while (c < k) {
      val off = c * dim
      var s = 0.0
      var i = 0
      while (i < dim) {
        if (v.isNullAt(i))
          throw new IllegalArgumentException(
            s"centroid_topn: null element at index $i")
        val d = v.getDouble(i) - flat(off + i)
        s += d * d
        i += 1
      }
      ds(c) = s
      c += 1
    }
    val take = math.min(n, k)
    val out = new Array[Any](take)
    val used = new Array[Boolean](k)
    var r = 0
    while (r < take) {
      var best = -1
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < k) {
        if (!used(j) && ds(j) < bestD) { bestD = ds(j); best = j }
        j += 1
      }
      used(best) = true
      out(r) = best
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** `v - centroid(cell)`, raw IEEE element subtraction (see
    * [[VectorFunctions.centroidResidual]]). Same loud-failure contract
    * as [[argmin]]. */
  def residual(v: ArrayData, cell: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"centroid_residual: vector has ${v.numElements()} elements, " +
          s"centroids have dim $dim")
    if (cell < 0 || cell >= k)
      throw new IllegalArgumentException(
        s"centroid_residual: cell $cell out of [0,$k)")
    val off = cell * dim
    val out = new Array[Any](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i))
        throw new IllegalArgumentException(
          s"centroid_residual: null element at index $i")
      out(i) = v.getDouble(i) - flat(off + i)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Codegen'd n-nearest-centroid probe list — see
  * [[VectorFunctions.centroidTopN]]. */
case class CentroidTopNExpression(
    child: Expression,
    centroids: IndexedSeq[IndexedSeq[Double]],
    n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "centroid_topn"

  override def stringArgs: Iterator[Any] =
    Iterator(child,
      s"centroids[${centroids.length}x${centroids.headOption.map(_.length).getOrElse(0)}]",
      n)

  @transient private lazy val table = new CentroidTable(
    centroids.flatten.toArray, centroids.length,
    centroids.headOption.map(_.length).getOrElse(0))

  override def nullSafeEval(v: Any): Any =
    table.topN(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidTable", table,
      classOf[CentroidTable].getName)
    defineCodeGen(ctx, ev, v => s"$ref.topN($v, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd residual against a centroid table — see
  * [[VectorFunctions.centroidResidual]]. */
case class CentroidResidualExpression(
    left: Expression,
    right: Expression,
    centroids: IndexedSeq[IndexedSeq[Double]]) extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "centroid_residual"

  override def stringArgs: Iterator[Any] =
    Iterator(left, right,
      s"centroids[${centroids.length}x${centroids.headOption.map(_.length).getOrElse(0)}]")

  @transient private lazy val table = new CentroidTable(
    centroids.flatten.toArray, centroids.length,
    centroids.headOption.map(_.length).getOrElse(0))

  override def nullSafeEval(v: Any, cell: Any): Any =
    table.residual(v.asInstanceOf[ArrayData], cell.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidTable", table,
      classOf[CentroidTable].getName)
    defineCodeGen(ctx, ev, (v, c) => s"$ref.residual($v, $c)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd nearest-centroid assignment — see
  * [[VectorFunctions.centroidArgmin]]. */
case class CentroidArgminExpression(
    child: Expression,
    centroids: IndexedSeq[IndexedSeq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "centroid_argmin"

  /** A k-in-the-hundreds table must not print element-by-element into
    * every explain/treeString. */
  override def stringArgs: Iterator[Any] =
    Iterator(child,
      s"centroids[${centroids.length}x${centroids.headOption.map(_.length).getOrElse(0)}]")

  @transient private lazy val table = new CentroidTable(
    centroids.flatten.toArray, centroids.length,
    centroids.headOption.map(_.length).getOrElse(0))

  override def nullSafeEval(input: Any): Any =
    table.argmin(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidTable", table,
      classOf[CentroidTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.argmin($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
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

/** Codegen'd element-wise 6-dp rounding of a float/double array to
  * `array<double>` — the float-contract projection every fitted-model
  * consumer applies before distances. Bit-identical to
  * `transform(v, x -> round(cast(x as double), 6))` (same
  * BigDecimal-HALF_UP path as Spark's Round), but `transform` is a
  * CodegenFallback higher-order function that ejects the projection from
  * whole-stage codegen — this is the repo's one-pass expression form of
  * the same arithmetic (the hot encode path at scale). */
case class RoundVec6Expression(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "round_vec6"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    RoundVec6Expression.round6(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RoundVec6Expression.round6($c, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RoundVec6Expression {
  // NOT named `eval`: the companion class inherits eval(InternalRow), so
  // scalac would skip the static forwarder codegen calls through.
  def round6(v: ArrayData, isFloat: Boolean):
      org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = v.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val d = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      // Spark's Round(DoubleType): NaN/±Inf pass through, else
      // BigDecimal HALF_UP at scale 6
      out(i) =
        if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
        else java.math.BigDecimal.valueOf(d)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
