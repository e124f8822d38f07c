package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd integer squared distance between two `array<bigint>` code
  * columns — the SQ8 hot loop (`Similarity.sq8TopK` / `ivfSq8TopK`) as one
  * fused allocation-free loop inside whole-stage codegen, replacing the
  * interpreted `aggregate(zip_with(...))` HOF chain that builds an
  * intermediate array per candidate pair. Exact int64 arithmetic in the
  * same left-to-right order, so results are bit-identical to the HOF form
  * (pinned in PlansSpec) and both serve the same DuckDB oracle.
  *
  * Same ragged-input caveat as [[SqDist]]: fuses over `min(len)` where the
  * HOF form nulls; all graft code paths feed fixed-dim code arrays.
  *
  * Registered as SQL function `code_sq_dist` by [[GraftExtensions]].
  */
case class CodeSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"code_sq_dist requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "code_sq_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
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
         |long ${ev.value}Acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  ${ev.value}Acc += $d * $d;
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CodeSqDist =
    copy(left = newLeft, right = newRight)
}

object CodeSqDist {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[CodeSqDist].getName, "code_sq_dist")
}
