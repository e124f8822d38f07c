package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd squared-Euclidean distance between two `array<double>` columns.
  *
  * Performance upgrade over the HOF composition in `VectorOps.sqDist`
  * (`aggregate(zip_with(...))`), which materializes an intermediate array per
  * row; this is a single fused loop with no allocation, inlined into
  * whole-stage codegen. The summation order is the same left-to-right fold,
  * so results are bit-identical to the HOF form (and to the DuckDB oracle) —
  * the two implementations are interchangeable under the same oracle.
  *
  * DIVERGENCE on ragged input: when the arrays differ in length this fuses
  * over `min(len(a), len(b))` elements, while the HOF form (`zip_with` pads
  * the short side with nulls) returns NULL. Every graft pipeline feeds
  * equal-length vectors (fixed `dim`), where the two are bit-identical; do
  * not rely on either behavior for malformed input.
  *
  * Registered as SQL function `sq_dist` by [[GraftExtensions]].
  */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sq_dist requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  ${ev.value}Acc += $d * $d;
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}

object SqDist {
  val info: ExpressionInfo = new ExpressionInfo(classOf[SqDist].getName, "sq_dist")
}
