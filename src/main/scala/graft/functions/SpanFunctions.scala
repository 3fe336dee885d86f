package graft.functions

import org.apache.spark.sql.{Column, GraftInternal}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local span removal for substring-level dedup
  * ([[graft.pipeline.Dedup.repeatedSpanRemoval]] /
  * [[graft.pipeline.SpanIndex]]): given a document's word array and the
  * start positions of its duplicated `k`-grams, drop every covered word
  * and return (removed_words, kept_text).
  *
  * The declarative spelling — materialize the covered-position array and
  * `filter(w, (_, i) => !array_contains(covered, i))` — scans the covered
  * array per word: O(doc²) for a fully-marked document, ~10¹⁰ comparisons
  * in ONE task at the gopher cap. This expression is the O(doc) form: the
  * starts sort once, intervals merge positionally during a single
  * left-to-right pass, and the kept words append to one builder.
  * Identical output by construction (start positions never extend past
  * the last word: p ≤ n−k ⇒ p+k−1 ≤ n−1), spec-pinned against the
  * declarative spelling on random inputs. */
object SpanFunctions {

  /** (removed_words int, kept_text string) of `words` after cutting every
    * interval [p, p+k-1] for p in `starts` (any order, duplicates fine). */
  def spanRemove(words: Column, starts: Column, k: Int): Column =
    GraftInternal.column(SpanRemoveExpression(
      GraftInternal.expression(words), GraftInternal.expression(starts), k))

  /** The merge pass — callable from generated code. */
  def spanRemoveF(words: ArrayData, starts: ArrayData, k: Int): InternalRow = {
    val m = starts.numElements()
    val st = new Array[Int](m)
    var x = 0
    while (x < m) { st(x) = starts.getInt(x); x += 1 }
    java.util.Arrays.sort(st)
    val n = words.numElements()
    val sb = new java.lang.StringBuilder
    var removed = 0
    var first = true
    var j = 0
    var curEnd = -1
    var i = 0
    while (i < n) {
      while (j < m && st(j) <= i) {
        val e = st(j) + k - 1
        if (e > curEnd) curEnd = e
        j += 1
      }
      if (i <= curEnd) removed += 1
      else {
        if (!first) sb.append(' ')
        sb.append(words.getUTF8String(i).toString)
        first = false
      }
      i += 1
    }
    new GenericInternalRow(
      Array[Any](removed, UTF8String.fromString(sb.toString)))
  }
}

/** Codegen'd O(doc) span removal — see [[SpanFunctions.spanRemove]]. */
case class SpanRemoveExpression(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("removed_words", IntegerType, nullable = false),
    StructField("kept_text", StringType, nullable = false)))
  override def prettyName: String = "span_remove"
  override def nullSafeEval(words: Any, starts: Any): Any =
    SpanFunctions.spanRemoveF(
      words.asInstanceOf[ArrayData], starts.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (w, s) => s"graft.functions.SpanFunctions.spanRemoveF($w, $s, $k)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
