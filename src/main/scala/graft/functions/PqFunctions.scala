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

  /** Cell-aware ADC for IVF-PQ ([[graft.pipeline.IvfPq]]): per row
    * (codes, cell), the ADC distance to every query whose probe list
    * contains `cell`, null otherwise — `lutByCell(q)(cell)` is the
    * query's flat residual LUT for that cell (empty = not probed). One
    * plan reference object; rows outside every probe list cost one
    * array-null write per query. */
  def ivfPqAdc(
      codes: Column,
      cell: Column,
      ksub: Int,
      lutByCell: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]): Column =
    GraftInternal.column(IvfPqAdcExpression(
      GraftInternal.expression(codes), GraftInternal.expression(cell),
      ksub, lutByCell))
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

/** See [[PqFunctions.ivfPqAdc]]. */
case class IvfPqAdcExpression(
    left: Expression,
    right: Expression,
    ksub: Int,
    lutByCell: IndexedSeq[IndexedSeq[IndexedSeq[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "ivf_pq_adc"

  override def stringArgs: Iterator[Any] =
    Iterator(left, right, ksub,
      s"luts[${lutByCell.length}x${lutByCell.headOption.map(_.length).getOrElse(0)}]")

  @transient private lazy val table = new IvfPqAdcTable(
    lutByCell.map(_.map(l => if (l.isEmpty) null else l.toArray).toArray).toArray,
    ksub)

  override def nullSafeEval(codes: Any, cell: Any): Any =
    table.adc(codes.asInstanceOf[ArrayData], cell.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfPqAdcTable", table,
      classOf[IvfPqAdcTable].getName)
    defineCodeGen(ctx, ev, (c, cl) => s"$ref.adc($c, $cl)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Per-query, per-cell flat LUT holder callable from generated code —
  * `lutByCell(q)(cell)` null when query q does not probe `cell`. Same
  * loud-failure contract as [[PqAdcTable]]. */
final class IvfPqAdcTable(lutByCell: Array[Array[Array[Double]]], ksub: Int)
    extends Serializable {
  def adc(codes: ArrayData, cell: Int): GenericArrayData = {
    val m = codes.numElements()
    val nq = lutByCell.length
    val out = new Array[Any](nq)
    var q = 0
    while (q < nq) {
      val byCell = lutByCell(q)
      if (cell < 0 || cell >= byCell.length)
        throw new IllegalArgumentException(
          s"ivf_pq_adc: cell $cell out of [0,${byCell.length})")
      val lut = byCell(cell)
      if (lut == null) out(q) = null
      else {
        if (lut.length != m * ksub)
          throw new IllegalArgumentException(
            s"ivf_pq_adc: $m codes against a ${lut.length / ksub}-subspace LUT")
        var s = 0.0
        var j = 0
        while (j < m) {
          val c = codes.getInt(j)
          if (c < 0 || c >= ksub)
            throw new IllegalArgumentException(
              s"ivf_pq_adc: code $c out of [0,$ksub)")
          s += lut(j * ksub + c)
          j += 1
        }
        out(q) = s
      }
      q += 1
    }
    new GenericArrayData(out)
  }
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
