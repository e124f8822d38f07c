package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd polynomial codepoint hash: `h = (h*31 + codePoint) % 1000003`,
  * left fold from `h = 0` — the native twin of `Dedup.tokenId`
  * (`aggregate(transform(split(t,""), ascii), 0, ...)`), which interprets a
  * per-character lambda chain (higher-order functions are CodegenFallback in
  * Spark) and dominates the MinHash/SimHash/fingerprint pipelines.
  *
  * Identical results for any string: iteration is by Unicode code point,
  * matching `split(t,"")` (which keeps surrogate pairs together) followed by
  * `ascii` (first code point). Integer arithmetic — no float concerns.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"poly_hash requires a string argument, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(v: Any): Any =
    PolyHash.hash(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.PolyHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  val info: ExpressionInfo = new ExpressionInfo(classOf[PolyHash].getName, "poly_hash")

  /** Shared by interpreted and generated code paths. */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % 1000003L
      i += Character.charCount(cp)
    }
    h
  }
}
