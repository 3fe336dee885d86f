package graft.functions

import org.apache.spark.sql.{Column, GraftInternal}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.lower
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

import graft.pipeline.ContamGate

/** Row-local benchmark-contamination check — the codegen wrapper around a
  * fitted [[graft.pipeline.ContamGate]] (the model table rides as ONE
  * plan reference object; the generated code is a static call per row,
  * whole-stage codegen intact). See [[graft.pipeline.Contamination]]. */
object ContamFunctions {

  /** Distinct word n-gram overlap of `text` with the fitted benchmark
    * set (IntegerType; lowercasing applied here, matching
    * [[TextFunctions.wordShingles]]'s contract). */
  def overlapCount(text: Column, gate: ContamGate): Column =
    GraftInternal.column(
      ContamOverlapExpression(GraftInternal.expression(lower(text)), gate))
}

/** Codegen'd distinct-gram overlap count over StringType input. */
case class ContamOverlapExpression(child: Expression, gate: ContamGate)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "contam_overlap"

  override def nullSafeEval(input: Any): Any =
    gate.overlap(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("contamGate", gate,
      classOf[ContamGate].getName)
    defineCodeGen(ctx, ev, c => s"$ref.overlap($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
