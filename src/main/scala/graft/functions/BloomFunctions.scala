package graft.functions

import org.apache.spark.sql.{Column, GraftInternal}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic Bloom filters for join pruning at scale.
  *
  * The 100 TB shape: a dimension/seen-key set too large to broadcast as a
  * hash relation still fits as a KB–MB bit array. `bloomAgg` builds it
  * distributed (bit-OR partial merge — the shuffle carries m/8-byte
  * arrays), the driver collects ONE binary value, and `mightContain`
  * rides the corpus scan as a codegen'd row-local predicate — pruning
  * before any join shuffle. Semi joins prune might-contain=false rows
  * outright; anti joins get definite-negatives for free (no false
  * negatives) and only might-contain survivors reach the exact join.
  * Results are therefore EXACTLY the plain join's — false positives only
  * cost work, never correctness — which is what the oracles pin.
  *
  * Hashing is the suite's deterministic family: h1 = mix(fnv1a64(key)),
  * h2 = mix(h1) | 1 (forced odd), probe i sets bit (h1 + i·h2) mod m
  * (Kirsch–Mitzenmacher double hashing; m a power of two so the mod is a
  * mask). Bit-OR merging is order-independent, so the distributed build
  * equals the local one byte-for-byte regardless of partitioning. */
object Bloom {

  /** Probe bit positions are fully determined by (key, mBits, k). */
  def add(bits: Array[Byte], s: UTF8String, k: Int): Unit = {
    val m = bits.length.toLong * 8
    val h1 = Hll.mix(TextFunctions.fnv1a64(s))
    val h2 = Hll.mix(h1) | 1L
    var i = 0
    var h = h1
    while (i < k) {
      val bit = (h & (m - 1)).toInt
      bits(bit >>> 3) = (bits(bit >>> 3) | (1 << (bit & 7))).toByte
      h += h2
      i += 1
    }
  }

  /** Never false-negative membership probe; codegen calls this statically. */
  def contains(bits: Array[Byte], s: UTF8String, k: Int): Boolean = {
    val m = bits.length.toLong * 8
    val h1 = Hll.mix(TextFunctions.fnv1a64(s))
    val h2 = Hll.mix(h1) | 1L
    var i = 0
    var h = h1
    while (i < k) {
      val bit = (h & (m - 1)).toInt
      if ((bits(bit >>> 3) & (1 << (bit & 7))) == 0) return false
      h += h2
      i += 1
    }
    true
  }

  /** OR `other` into `acc`, returning `acc`. */
  def mergeInto(acc: Array[Byte], other: Array[Byte]): Array[Byte] = {
    require(acc.length == other.length,
      s"cannot merge blooms of different size (${acc.length} vs ${other.length} bytes)")
    var j = 0
    while (j < acc.length) { acc(j) = (acc(j) | other(j)).toByte; j += 1 }
    acc
  }

  /** Expected false-positive probability of a filter built from n keys. */
  def expectedFpp(mBits: Long, k: Int, n: Long): Double =
    math.pow(1.0 - math.exp(-k.toDouble * n / mBits), k.toDouble)
}

/** groupBy/global aggregate: fold string keys into an mBits-bit Bloom
  * filter (BinaryType, mBits/8 bytes). mBits must be a power of two. */
case class BloomAgg(
    child: Expression,
    mBits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](mBits / 8)
  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Bloom.add(buffer, v.asInstanceOf[UTF8String], k)
    buffer
  }
  override def merge(acc: Array[Byte], other: Array[Byte]): Array[Byte] =
    Bloom.mergeInto(acc, other)
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storage: Array[Byte]): Array[Byte] = storage
  override def eval(buffer: Array[Byte]): Any = buffer
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
  override def prettyName: String = "bloom_agg"
}

/** Row-local membership predicate over a DRIVER-COLLECTED filter: the
  * bytes ride into generated code as a reference object, so the corpus
  * scan stays inside whole-stage codegen — no join, no shuffle, one
  * static call per row. */
case class BloomMightContain(bloom: Array[Byte], child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(input: Any): Any =
    Bloom.contains(bloom, input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, "byte[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.Bloom.contains($ref, $c, $k)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"
}

/** SQL form of the membership probe: the filter arrives as an EXPRESSION
  * (scalar subquery / literal / column) instead of driver-held bytes —
  * `bloom_contains(bloom, key, k)`. Eval-only (the codegen'd
  * driver-bytes [[BloomMightContain]] is the hot-path form). */
case class BloomContainsExpr(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(bloom: Any, key: Any): Any =
    Bloom.contains(bloom.asInstanceOf[Array[Byte]], key.asInstanceOf[UTF8String], k)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContainsExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "bloom_contains"
}

/** Column-facade. Default 2^18 bits (32 KB) / 7 probes ≈ 0.8% fpp at
  * 20k keys — size mBits ≈ 10·n for ~1% at other scales. */
object BloomFunctions {
  val DefaultBits: Int = 1 << 18
  val DefaultK: Int = 7

  def bloomAgg(c: Column, mBits: Int = DefaultBits, k: Int = DefaultK): Column = {
    require(mBits >= 64 && Integer.bitCount(mBits) == 1,
      s"mBits=$mBits must be a power of two (the probe mod is a mask)")
    GraftInternal.column(
      BloomAgg(GraftInternal.expression(c), mBits, k).toAggregateExpression())
  }

  def mightContain(bloom: Array[Byte], c: Column, k: Int = DefaultK): Column =
    GraftInternal.column(BloomMightContain(bloom, GraftInternal.expression(c), k))
}
