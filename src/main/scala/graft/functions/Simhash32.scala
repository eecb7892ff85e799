package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expression wrapper over [[TextKernels.simhash32]] — the
  * 32-bit token-level simhash the dedup pipeline computes via a typed
  * map. Registered for SQL as `graft_simhash32`; codegen emits a direct
  * static call into the JVM kernel (one string pass, no interpreted
  * expression tree), so SQL users get the same hot-path cost as the
  * Scala API.
  */
case class Simhash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash32 needs a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    TextKernels.simhash32(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.simhash32($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): Simhash32 =
    copy(child = newChild)
}
