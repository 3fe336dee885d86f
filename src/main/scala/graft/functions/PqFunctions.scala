package graft.functions

import org.apache.spark.sql.{Column, GraftInternal}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen support for product-quantization ADC scans
  * ([[graft.pipeline.Pq]]): the per-query lookup tables ride as ONE plan
  * reference object and every row costs m lookups + adds per query —
  * no join, no shuffle, whole-stage codegen intact. */
object PqFunctions {

  /** For a codes column (array<int>, length m): the ADC distances to
    * EVERY query as array<double> — distances(q) = Σ_j luts(q)(j·ksub +
    * codes(j)), j ascending (the oracle's fold order). */
  def pqAdc(codes: Column, ksub: Int, luts: Array[Array[Double]]): Column =
    GraftInternal.column(PqAdcExpression(
      GraftInternal.expression(codes), ksub, luts.map(_.toIndexedSeq).toIndexedSeq))
}

/** See [[PqFunctions.pqAdc]]. */
case class PqAdcExpression(
    child: Expression,
    ksub: Int,
    luts: IndexedSeq[IndexedSeq[Double]]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_adc"

  override def stringArgs: Iterator[Any] =
    Iterator(child, ksub, s"luts[${luts.length}x${luts.headOption.map(_.length).getOrElse(0)}]")

  @transient private lazy val table =
    new PqAdcTable(luts.map(_.toArray).toArray, ksub)

  override def nullSafeEval(input: Any): Any =
    table.adc(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcTable", table,
      classOf[PqAdcTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.adc($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Flat LUT holder callable from generated code. Malformed codes fail
  * LOUDLY (the centroid-table convention): an out-of-range code means a
  * codes/model mismatch, not a row to guess about. */
final class PqAdcTable(luts: Array[Array[Double]], ksub: Int)
    extends Serializable {
  def adc(codes: ArrayData): GenericArrayData = {
    val m = codes.numElements()
    val out = new Array[Any](luts.length)
    var q = 0
    while (q < luts.length) {
      val lut = luts(q)
      if (lut.length != m * ksub)
        throw new IllegalArgumentException(
          s"pq_adc: ${m} codes against a ${lut.length / ksub}-subspace LUT")
      var s = 0.0
      var j = 0
      while (j < m) {
        val c = codes.getInt(j)
        if (c < 0 || c >= ksub)
          throw new IllegalArgumentException(s"pq_adc: code $c out of [0,$ksub)")
        s += lut(j * ksub + c)
        j += 1
      }
      out(q) = s
      q += 1
    }
    new GenericArrayData(out)
  }
}
