package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expression over [[TextKernels.minhashSig]]: the full
  * k-permutation MinHash signature of a document as one per-row array —
  * what makes the dedup pipeline AUTHORABLE FROM SQL
  * (`graft_minhash_sig(text, 16, 3)`, registered by GraftExtensions;
  * d11 spells d04's whole LSH-banding pipeline in `spark.sql` with it).
  * Value-identical to the [[MinHashAgg]] aggregate the Scala API uses,
  * so both spellings share one oracle. Codegen is a direct static call
  * into the JVM kernel — one string pass, no interpreted per-shingle
  * expression tree.
  */
case class MinhashSigExpr(child: Expression, k: Int, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes() =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig needs a string input, got ${child.dataType}")
    else if (k < 1 || n < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig needs k >= 1 and n >= 1, got k=$k n=$n")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TextKernels.minhashSig(input.asInstanceOf[UTF8String].toString, k, n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.TextKernels.minhashSig($c.toString(), $k, $n));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)
}
