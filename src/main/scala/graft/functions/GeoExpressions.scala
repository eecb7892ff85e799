package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Squared euclidean distance (x1-x2)^2 + (y1-y2)^2 as a first-class
  * Catalyst expression.
  *
  * Being a named node (not an opaque arithmetic tree) is what lets
  * [[graft.plans.EpsJoinRewrite]] RECOGNIZE an eps-distance join
  * predicate inside a logical plan and rewrite the join from a
  * nested-loop cross product to a grid-bucketed hash equi-join — the
  * same role `ST_Distance` plays for spatial-SQL extensions.
  */
case class DistSq(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dist_sq needs four double inputs, got ${children.map(_.dataType).mkString(", ")}")

  override def nullSafeEval(x1: Any, y1: Any, x2: Any, y2: Any): Any = {
    val dx = x1.asInstanceOf[Double] - x2.asInstanceOf[Double]
    val dy = y1.asInstanceOf[Double] - y2.asInstanceOf[Double]
    dx * dx + dy * dy
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x1, y1, x2, y2) => {
      val dx = ctx.freshName("dx")
      val dy = ctx.freshName("dy")
      s"""
         |double $dx = $x1 - $x2;
         |double $dy = $y1 - $y2;
         |${ev.value} = $dx * $dx + $dy * $dy;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): DistSq =
    copy(first = a, second = b, third = c, fourth = d)
}

/** Public column API for geometric predicates. */
object Geo {
  /** Squared euclidean distance between (x1, y1) and (x2, y2). Write
    * eps joins as `a.join(b, Geo.distSq(...) <= eps * eps)` — with
    * [[graft.plans.GraftExtensions]] installed the optimizer plans it
    * as a bucketed equi-join instead of a nested loop.
    */
  def distSq(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    Bridge.column(DistSq(
      Bridge.expression(x1.cast("double")), Bridge.expression(y1.cast("double")),
      Bridge.expression(x2.cast("double")), Bridge.expression(y2.cast("double"))))
}
