package graft.functions

import org.apache.spark.sql.{Column, GraftInternal}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count–Min frequency sketch (Cormode & Muthukrishnan 2005), the
  * frequency member of the deterministic sketch suite ([[Hll]] distinct,
  * [[Bloom]] membership, [[HeavyHitters]] top-k): depth×width long
  * counters, update adds 1 to one counter per row (bucket i =
  * (h1 + i·h2) mod width — the same Kirsch–Mitzenmacher double hashing
  * as [[Bloom]], width a power of two), merge is elementwise SUM
  * (order-free), and the point estimate is the min over rows — an upper
  * bound on the true count, within εN with probability 1−δ for
  * width=⌈e/ε⌉, depth=⌈ln 1/δ⌉.
  *
  * Everything is integer arithmetic over the suite's deterministic hash
  * family, so the whole sketch — counters and estimates — replays
  * hash-EXACTLY in the DuckDB oracle (group-by sums per (row, bucket),
  * min over rows), with none of the IEEE fold-order care the HLL
  * estimate needs.
  *
  * 100 TB shape: `cmsAgg` is ONE pass with map-side partial merge — the
  * shuffle carries depth·width·8-byte arrays per group, never keys; the
  * driver-collected sketch then answers any number of point queries
  * row-locally ([[CmsEstimate]]), e.g. stream-frequency gating without a
  * second corpus aggregation. */
object Cms {

  def bucket(h1: Long, h2: Long, i: Int, width: Int): Int =
    ((h1 + i.toLong * h2) & (width - 1)).toInt

  private def hashes(s: UTF8String): (Long, Long) = {
    val h1 = Hll.mix(TextFunctions.fnv1a64(s))
    (h1, Hll.mix(h1) | 1L)
  }

  def add(counters: Array[Long], s: UTF8String, depth: Int, width: Int): Unit = {
    val (h1, h2) = hashes(s)
    var i = 0
    while (i < depth) {
      counters(i * width + bucket(h1, h2, i, width)) += 1L
      i += 1
    }
  }

  /** Point estimate: min over rows — never below the true count. */
  def estimate(counters: Array[Long], s: UTF8String, depth: Int, width: Int): Long = {
    val (h1, h2) = hashes(s)
    var min = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = counters(i * width + bucket(h1, h2, i, width))
      if (c < min) min = c
      i += 1
    }
    min
  }

  /** Elementwise sum of `other` into `acc`, returning `acc`. */
  def mergeInto(acc: Array[Long], other: Array[Long]): Array[Long] = {
    require(acc.length == other.length,
      s"cannot merge CMS of different shape (${acc.length} vs ${other.length} counters)")
    var j = 0
    while (j < acc.length) { acc(j) += other(j); j += 1 }
    acc
  }

  def serialize(counters: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(counters.length * 8)
    bb.asLongBuffer().put(counters)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }
}

/** groupBy/global aggregate: fold string keys into a CMS (BinaryType,
  * depth·width·8 bytes). width must be a power of two. */
case class CmsAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)
  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Cms.add(buffer, v.asInstanceOf[UTF8String], depth, width)
    buffer
  }
  override def merge(acc: Array[Long], other: Array[Long]): Array[Long] =
    Cms.mergeInto(acc, other)
  override def serialize(buffer: Array[Long]): Array[Byte] = Cms.serialize(buffer)
  override def deserialize(storage: Array[Byte]): Array[Long] = Cms.deserialize(storage)
  override def eval(buffer: Array[Long]): Any = Cms.serialize(buffer)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsAgg =
    copy(child = newChild)
  override def prettyName: String = "cms_agg"
}

/** Row-local point-frequency estimate over a DRIVER-COLLECTED sketch
  * (probe rows, not the corpus hot path — CodegenFallback is fine). */
case class CmsEstimate(sketch: Array[Byte], child: Expression, depth: Int, width: Int)
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val counters = Cms.deserialize(sketch)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    Cms.estimate(counters, input.asInstanceOf[UTF8String], depth, width)
  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
  override def prettyName: String = "cms_estimate"
}

/** SQL form: sketch as an EXPRESSION (scalar subquery / column) —
  * `cms_estimate(sketch, key, depth, width)`. Deserializes per row;
  * the driver-held [[CmsEstimate]] is the bulk-probe form. */
case class CmsEstimateExpr(left: Expression, right: Expression, depth: Int, width: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(sketch: Any, key: Any): Any =
    Cms.estimate(Cms.deserialize(sketch.asInstanceOf[Array[Byte]]),
      key.asInstanceOf[UTF8String], depth, width)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimateExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cms_estimate"
}

/** Column-facade. Defaults: depth 4, width 16384 (512 KB sketch) —
  * ε ≈ e/16384 ≈ 0.017% of N, δ ≈ e^-4 ≈ 1.8%. */
object CmsFunctions {
  val DefaultDepth: Int = 4
  val DefaultWidth: Int = 16384

  def cmsAgg(c: Column, depth: Int = DefaultDepth, width: Int = DefaultWidth): Column = {
    require(depth >= 1 && width >= 2 && Integer.bitCount(width) == 1,
      s"cms depth=$depth width=$width invalid (width must be a power of two)")
    GraftInternal.column(
      CmsAgg(GraftInternal.expression(c), depth, width).toAggregateExpression())
  }

  def cmsEstimate(sketch: Array[Byte], c: Column,
      depth: Int = DefaultDepth, width: Int = DefaultWidth): Column =
    GraftInternal.column(
      CmsEstimate(sketch, GraftInternal.expression(c), depth, width))
}
