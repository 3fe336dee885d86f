package graft.functions

import org.apache.spark.sql.{Column, GraftInternal}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Kafka-compatible 32-bit MurmurHash2.
  *
  * The reference routes keyed records with this exact hash
  * (reference: src/main/java/producer/MurmurHash2.java:12-59, used by
  * src/main/java/commons/utils/PartitionSelector.java:79-101), so key→partition
  * parity is a correctness surface: Spark's built-in `hash()` is Murmur3 with a
  * different seed and CANNOT be substituted. The algorithm itself is the
  * public-domain MurmurHash2 as published by Austin Appleby and used by Apache
  * Kafka (seed 0x9747b28c).
  */
object Murmur2 {
  private final val Seed = 0x9747b28c
  private final val M = 0x5bd1e995
  private final val R = 24

  /** 32-bit murmur2 of raw bytes. Callable from generated code. */
  def hash(data: Array[Byte]): Int = {
    val length = data.length
    var h = Seed ^ length
    val length4 = length / 4
    var i = 0
    while (i < length4) {
      val i4 = i * 4
      var k = (data(i4) & 0xff) +
        ((data(i4 + 1) & 0xff) << 8) +
        ((data(i4 + 2) & 0xff) << 16) +
        ((data(i4 + 3) & 0xff) << 24)
      k *= M
      k ^= k >>> R
      k *= M
      h *= M
      h ^= k
      i += 1
    }
    // Handle the last few bytes of the input array (fall-through on purpose)
    val tail = length & ~3
    val rem = length % 4
    if (rem >= 3) h ^= (data(tail + 2) & 0xff) << 16
    if (rem >= 2) h ^= (data(tail + 1) & 0xff) << 8
    if (rem >= 1) { h ^= data(tail) & 0xff; h *= M }
    h ^= h >>> 13
    h *= M
    h ^= h >>> 15
    h
  }

  /** murmur2 of a UTF-8 string. Callable from generated code. */
  def hashUtf8(s: UTF8String): Int = hash(s.getBytes)

  def hashString(s: String): Int =
    hash(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Non-negative bucket in [0, numPartitions) — the reference's positive
    * masking (`& 0x7fffffff`) then modulo
    * (src/main/java/commons/utils/PartitionSelector.java:95-100). */
  def partition(key: String, numPartitions: Int): Int =
    (hashString(key) & 0x7fffffff) % numPartitions

  /** Column form: murmur2 hash of a string/binary column (IntegerType). */
  def murmur2(c: Column): Column =
    GraftInternal.column(Murmur2Expression(GraftInternal.expression(c)))

  /** Column form of [[partition]]. */
  def murmur2Partition(c: Column, numPartitions: Int): Column = {
    import org.apache.spark.sql.functions._
    pmod(murmur2(c).bitwiseAND(0x7fffffff), lit(numPartitions))
  }
}

/** Codegen'd murmur2 over StringType or BinaryType input; stays inside
  * whole-stage codegen so routing costs one virtual call per row, not a UDF
  * ser/deser round-trip.
  */
case class Murmur2Expression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "murmur2"

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String  => Murmur2.hashUtf8(s)
    case b: Array[Byte] => Murmur2.hash(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case _: StringType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.Murmur2.hashUtf8($c)")
      case _ =>
        defineCodeGen(ctx, ev, c => s"graft.functions.Murmur2.hash($c)")
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
