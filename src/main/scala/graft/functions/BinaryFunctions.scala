package graft.functions

import org.apache.spark.sql.{Column, GraftInternal}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Byte-level helpers over `binary` columns — the verification surface of
  * the multimodal plumbing (reference `/root/reference` carries record
  * payloads as opaque byte arrays; here image/audio/video content rides
  * the same way, and byte-exact checks need a cheap row-local checksum
  * that both engines can replay).
  */
object BinaryFunctions {

  /** Sum of the UNSIGNED byte values of a binary column (LongType, 0 for
    * empty input) — a one-pass codegen'd checksum. Used to verify that
    * byte-range operators (frame/slice sampling) handed downstream the
    * exact bytes they claim: the oracle recomputes the same sum from the
    * deterministic content definition. Row-local, whole-stage codegen
    * intact — the 100 TB shape is one scan pass. */
  def byteSum(c: Column): Column =
    GraftInternal.column(ByteSumExpression(GraftInternal.expression(c)))
}

/** Codegen'd unsigned-byte sum over BinaryType input. */
case class ByteSumExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "byte_sum"

  override def nullSafeEval(input: Any): Any =
    ByteSumExpression.evalBytes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ByteSumExpression.evalBytes($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteSumExpression {
  def evalBytes(b: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < b.length) { s += b(i) & 0xff; i += 1 }
    s
  }
}
