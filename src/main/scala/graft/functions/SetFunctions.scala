package graft.functions

import org.apache.spark.sql.{Column, GraftInternal}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Row-local membership probes against driver-collected id sets.
  *
  * The streaming ingest chain ([[graft.pipeline.LshIndex.ingestBatch]])
  * derives batch-bounded id sets (corpus-dup ids, within-batch loser ids)
  * that several downstream frames must subtract. Expressing the
  * subtraction as anti-joins costs a broadcast build + an AQE stage PER
  * CONSUMER per micro-batch — pure fixed overhead at a 500 ms trigger.
  * Shipping the collected sorted set back into the plan as a codegen
  * reference object (the [[BloomMightContain]] / ContamGate discipline)
  * turns each consumer into a flat cache-scan + O(log n) filter, and the
  * set never appears in the plan string (no literal-list bloat, unlike
  * `isInCollection` past a few thousand ids). */
object SetFunctions {

  /** True iff `c` (long) is in the SORTED id array — a plan reference
    * object, not a literal list. */
  def inLongSet(c: Column, sortedIds: Array[Long]): Column =
    GraftInternal.column(
      LongSetContainsExpression(GraftInternal.expression(c), sortedIds))

  /** Binary-search membership; `ids` must be sorted ascending. */
  def containsLong(ids: Array[Long], v: Long): Boolean =
    java.util.Arrays.binarySearch(ids, v) >= 0
}

/** Codegen'd sorted-long-array membership ([[SetFunctions.inLongSet]]). */
case class LongSetContainsExpression(child: Expression, ids: Array[Long])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "in_long_set"
  override def nullSafeEval(input: Any): Any =
    SetFunctions.containsLong(ids, input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("longSet", ids, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SetFunctions.containsLong($ref, $c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
