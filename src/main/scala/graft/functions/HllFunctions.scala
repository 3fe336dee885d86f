package graft.functions

import org.apache.spark.sql.{Column, GraftInternal}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** HyperLogLog distinct-count sketches (Flajolet et al. 2007) with a
  * DETERMINISTIC hash (FNV-1a 64, [[TextFunctions.fnv1a64]]) so the whole
  * sketch — registers and estimate — replays bit-exactly in the DuckDB
  * oracle (register = max rho per bucket; estimate = the same IEEE fold).
  *
  * This is the mergeable-sketch warehouse pattern for 100 TB distinct
  * counts: `hllSketch` builds per-group register arrays in ONE pass with
  * map-side partial merge (the shuffle carries m-byte sketches, never
  * values), `hllMerge` unions pre-aggregated sketches (e.g. one stored per
  * partition/day), and `hllEstimate` is a per-group scalar. Standard error
  * ≈ 1.04/√m (m = 2^p registers; p = 9 → 512 B sketches, ±4.6%).
  *
  * Determinism contract (cross-engine): buckets are the TOP p hash bits,
  * rho = (64-p)+1 − bitlength(remaining bits); the harmonic sum folds
  * registers in ascending bucket order with terms 1.0/2^r (exact doubles),
  * so Spark's while-loop equals DuckDB's sequential `list_sum`. The
  * linear-counting branch (raw ≤ 2.5m with empty registers) uses
  * `m·ln(m/V)` — one libm call per GROUP (not per row), rounded at the
  * query edge like every other double in the suite.
  */
object Hll {

  /** Multiply–xorshift finalizer over the FNV value. FNV-1a's raw top bits
    * disperse poorly for short keys (212/512 buckets hit on a 20k-key test
    * without this); two mix rounds restore avalanche. Kept to ops that
    * replay exactly in HUGEINT SQL: unsigned shift (//2^k), 64-bit xor
    * (hi/lo split), multiply mod 2^64 by the 40-bit FNV prime. */
  def mix(v: Long): Long = {
    var h = v
    h ^= h >>> 33
    h *= 0x100000001b3L
    h ^= h >>> 29
    h *= 0x100000001b3L
    h ^ (h >>> 32)
  }

  /** Register index (top p bits) of a token hash. */
  def bucket(h: Long, p: Int): Int = (h >>> (64 - p)).toInt

  /** rho = leading-zero count of the remaining 64-p bits, + 1. */
  def rho(h: Long, p: Int): Int = {
    val w = h << p
    if (w == 0) 64 - p + 1 else java.lang.Long.numberOfLeadingZeros(w) + 1
  }

  /** Bias-corrected HLL estimate over an m-byte register array. */
  def estimate(regs: Array[Byte], p: Int): Double = {
    val m = 1 << p
    require(regs.length == m, s"sketch has ${regs.length} registers, expected $m")
    var s = 0.0
    var zeros = 0
    var j = 0
    while (j < m) {
      val r = regs(j) & 0xff
      if (r == 0) zeros += 1
      s += 1.0 / (1L << r).toDouble // r <= 64-p+1 <= 61 for p >= 4
      j += 1
    }
    val alpha =
      if (p == 4) 0.673
      else if (p == 5) 0.697
      else if (p == 6) 0.709
      else 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * m * m / s
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }

  /** Union `other` into `acc` (register-wise max), returning `acc`. */
  def mergeInto(acc: Array[Byte], other: Array[Byte]): Array[Byte] = {
    require(acc.length == other.length,
      s"cannot merge sketches of different precision (${acc.length} vs ${other.length} registers)")
    var j = 0
    while (j < acc.length) {
      if ((other(j) & 0xff) > (acc(j) & 0xff)) acc(j) = other(j)
      j += 1
    }
    acc
  }
}

/** Base for the two HLL aggregates: buffer = m register bytes. */
abstract class HllAggregateBase extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {
  def p: Int // validated in HllFunctions (base init runs before subclass fields)
  final def m: Int = 1 << p

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)
  override def merge(acc: Array[Byte], other: Array[Byte]): Array[Byte] =
    Hll.mergeInto(acc, other)
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storage: Array[Byte]): Array[Byte] = storage
  override def eval(buffer: Array[Byte]): Any = buffer
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** groupBy-aggregate: fold string values into an HLL sketch (BinaryType). */
case class HllSketchAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends HllAggregateBase {

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = Hll.mix(TextFunctions.fnv1a64(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]))
      val idx = Hll.bucket(h, p)
      val r = Hll.rho(h, p)
      if (r > (buffer(idx) & 0xff)) buffer(idx) = r.toByte
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "hll_sketch"
}

/** groupBy-aggregate: union pre-built sketches (register-wise max). */
case class HllMergeAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends HllAggregateBase {

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.mergeInto(buffer, v.asInstanceOf[Array[Byte]]) else buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllMergeAgg =
    copy(child = newChild)
  override def prettyName: String = "hll_merge"
}

/** Scalar: estimated distinct count of a sketch column. Per-GROUP rows only
  * (never on the row hot path), so CodegenFallback is fine here. */
case class HllEstimate(child: Expression, p: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(input: Any): Any =
    Hll.estimate(input.asInstanceOf[Array[Byte]], p)
  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
  override def prettyName: String = "hll_estimate"
}

/** Scalar: register-wise max of two sketches (set union), non-mutating.
  * Per-pair rows only — sketch algebra, not the row hot path. */
case class HllUnion(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val out = a.asInstanceOf[Array[Byte]].clone()
    Hll.mergeInto(out, b.asInstanceOf[Array[Byte]])
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HllUnion =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "hll_union"
}

/** Column-facade. */
object HllFunctions {
  val DefaultP = 9

  private def checkP(p: Int): Int = {
    require(p >= 4 && p <= 16, s"hll precision p=$p out of [4,16]")
    p
  }

  def hllSketch(c: Column, p: Int = DefaultP): Column =
    GraftInternal.column(
      HllSketchAgg(GraftInternal.expression(c), checkP(p)).toAggregateExpression())

  def hllMerge(c: Column, p: Int = DefaultP): Column =
    GraftInternal.column(
      HllMergeAgg(GraftInternal.expression(c), checkP(p)).toAggregateExpression())

  def hllEstimate(c: Column, p: Int = DefaultP): Column =
    GraftInternal.column(HllEstimate(GraftInternal.expression(c), checkP(p)))

  def hllUnion(a: Column, b: Column): Column =
    GraftInternal.column(
      HllUnion(GraftInternal.expression(a), GraftInternal.expression(b)))
}
