package graft.functions

import org.apache.spark.sql.{Column, GraftInternal}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) curve keys for multi-dimensional data layout.
  *
  * Sorting a table by `zvalue(a, b)` before writing clusters BOTH columns
  * at once: each output file covers a small rectangle of (a, b) space, so
  * parquet min/max stats prune files for predicates on EITHER column — the
  * standard layout trick for a 100 TB table queried along two axes, where
  * a plain sort clusters only its leading column and partitioning by one
  * column leaves the other unskippable.
  *
  * The key interleaves the low `bits` of each dimension (bit i of a →
  * bit 2i+1, bit i of b → bit 2i). Callers fold values into range first
  * (e.g. `pmod(col, lit(1 << bits))`) — plain modulo folding preserves
  * locality for dense ids; for arbitrary doubles, bucket by rank/quantile
  * first.
  */
object ZOrderFunctions {

  /** Morton-interleaved key of two integer columns (low `bits` of each). */
  def zvalue(a: Column, b: Column, bits: Int): Column =
    GraftInternal.column(ZValueExpression(
      GraftInternal.expression(a.cast("long")),
      GraftInternal.expression(b.cast("long")), bits))

  /** Interleave the low `bits` of a and b: a's bit i → output bit 2i+1,
    * b's bit i → output bit 2i. */
  def interleave(a: Long, b: Long, bits: Int): Long = {
    var out = 0L
    var i = 0
    while (i < bits) {
      out |= ((a >> i) & 1L) << (2 * i + 1)
      out |= ((b >> i) & 1L) << (2 * i)
      i += 1
    }
    out
  }
}

/** Codegen'd Morton interleave of two long columns. */
case class ZValueExpression(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
  // analysis-time coercion for the SQL path: `zvalue(int_col, int_col, 8)`
  // casts to long instead of ClassCastException-ing in eval (the Scala API
  // already casts; SQL args arrive as whatever the user typed)
  // Seq[DataType] (not AbstractDataType, which is private[sql] in Spark 4)
  // — covariance makes the override sound
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "zvalue"
  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderFunctions.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrderFunctions.interleave($a, $b, $bits)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
