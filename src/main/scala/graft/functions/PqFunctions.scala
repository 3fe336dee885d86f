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

  /** Per-(query-row, cell) flat residual LUT for the DISTRIBUTED IVF-PQ
    * path: lut[j·ksub + c] = ‖(qv − coarse(cell))_sub(j) − pq(j)(c)‖²,
    * computed row-locally with BOTH codebooks as one plan reference —
    * the arithmetic twin of the driver-side LUT in
    * [[graft.pipeline.IvfPq.adcTopK]], so the doubles agree exactly. */
  def ivfPqLut(
      qv: Column,
      cell: Column,
      coarse: IndexedSeq[IndexedSeq[Double]],
      pq: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]): Column =
    GraftInternal.column(IvfPqLutExpression(
      GraftInternal.expression(qv), GraftInternal.expression(cell),
      coarse, pq))

  /** ADC distance of ONE (lut, codes) pair — the join-side fold of the
    * distributed path: m lookups and adds, whole-stage codegen intact. */
  def pqAdcPair(lut: Column, codes: Column, ksub: Int): Column =
    GraftInternal.column(PqAdcPairExpression(
      GraftInternal.expression(lut), GraftInternal.expression(codes), ksub))
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

/** See [[PqFunctions.ivfPqLut]]. */
case class IvfPqLutExpression(
    left: Expression,
    right: Expression,
    coarse: IndexedSeq[IndexedSeq[Double]],
    pq: IndexedSeq[IndexedSeq[IndexedSeq[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "ivf_pq_lut"

  override def stringArgs: Iterator[Any] =
    Iterator(left, right,
      s"coarse[${coarse.length}x${coarse.headOption.map(_.length).getOrElse(0)}]",
      s"pq[${pq.length}x${pq.headOption.map(_.length).getOrElse(0)}]")

  @transient private lazy val table = new IvfPqLutTable(
    coarse.map(_.toArray).toArray,
    pq.map(_.map(_.toArray).toArray).toArray)

  override def nullSafeEval(qv: Any, cell: Any): Any =
    table.lut(qv.asInstanceOf[ArrayData], cell.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfPqLutTable", table,
      classOf[IvfPqLutTable].getName)
    defineCodeGen(ctx, ev, (q, c) => s"$ref.lut($q, $c)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codebook holder for [[IvfPqLutExpression]] — the identical fold
  * order as the driver-side LUT loop in `IvfPq.adcTopK`. */
final class IvfPqLutTable(
    coarse: Array[Array[Double]],
    pq: Array[Array[Array[Double]]]) extends Serializable {
  private val m = pq.length
  private val ksub = if (m == 0) 0 else pq(0).length
  private val dsub = if (ksub == 0) 0 else pq(0)(0).length
  private val dim = m * dsub

  def lut(qv: ArrayData, cell: Int): GenericArrayData = {
    if (qv.numElements() != dim)
      throw new IllegalArgumentException(
        s"ivf_pq_lut: query has ${qv.numElements()} elements, model dim $dim")
    if (cell < 0 || cell >= coarse.length)
      throw new IllegalArgumentException(
        s"ivf_pq_lut: cell $cell out of [0,${coarse.length})")
    val cen = coarse(cell)
    val out = new Array[Any](m * ksub)
    var j = 0
    while (j < m) {
      val cb = pq(j)
      var c = 0
      while (c < ksub) {
        val sub = cb(c)
        var s = 0.0
        var i = 0
        while (i < dsub) {
          val off = j * dsub + i
          val d = (qv.getDouble(off) - cen(off)) - sub(i)
          s += d * d
          i += 1
        }
        out(j * ksub + c) = s
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** See [[PqFunctions.pqAdcPair]]. */
case class PqAdcPairExpression(
    left: Expression,
    right: Expression,
    ksub: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_pair"

  override def nullSafeEval(lut: Any, codes: Any): Any =
    PqAdcPairExpression.adc(
      lut.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, c) =>
      s"graft.functions.PqAdcPairExpression.adc($l, $c, $ksub)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdcPairExpression {
  // NOT named `eval`: the companion class inherits eval(InternalRow), so
  // scalac would skip the static forwarder codegen calls through.
  def adc(lut: ArrayData, codes: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    if (lut.numElements() != m * ksub)
      throw new IllegalArgumentException(
        s"pq_adc_pair: $m codes against a ${lut.numElements() / ksub}-subspace LUT")
    var s = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      if (c < 0 || c >= ksub)
        throw new IllegalArgumentException(s"pq_adc_pair: code $c out of [0,$ksub)")
      s += lut.getDouble(j * ksub + c)
      j += 1
    }
    s
  }
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
