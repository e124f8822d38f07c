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

  /** Parameterized codepoint fold `h = (h·base + cp) mod m` — the content-
    * fingerprint family's per-char hash (base 131 mod 1e9+7), same
    * iteration semantics as [[hash]].
    */
  def hashBase(s: String, base: Long, mod: Long): Long = {
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * base + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }

  /** `h = (h·base + x) mod m` left fold over a long array — the rolling
    * token-id fingerprint.
    */
  def foldLongs(xs: org.apache.spark.sql.catalyst.util.ArrayData,
      base: Long, mod: Long): Long = {
    var h = 0L
    var i = 0
    val n = xs.numElements()
    while (i < n) { h = (h * base + xs.getLong(i)) % mod; i += 1 }
    h
  }
}

/** `poly_hash_base(s, base, mod)` — codegen'd parameterized codepoint hash,
  * value-identical to the interpreted HOF
  * `aggregate(transform(split(s,''), ascii), 0, (h,c) -> (h·base+c) % mod)`.
  */
case class PolyHashBase(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {
  require(base > 0 && mod > 1, s"need base > 0 and mod > 1, got $base/$mod")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"poly_hash_base requires a string argument, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash_base"

  override def nullSafeEval(v: Any): Any =
    PolyHash.hashBase(v.asInstanceOf[UTF8String].toString, base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.PolyHash.hashBase($c.toString(), ${base}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): PolyHashBase =
    copy(child = newChild)
}

/** `poly_fold(ids, base, mod)` — codegen'd rolling fold over `array<long>`,
  * value-identical to `aggregate(ids, 0L, (h,x) -> (h·base+x) % mod)`.
  */
case class PolyFold(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {
  require(base > 0 && mod > 1, s"need base > 0 and mod > 1, got $base/$mod")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"poly_fold requires array<bigint>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_fold"

  override def nullSafeEval(v: Any): Any =
    PolyHash.foldLongs(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.PolyHash.foldLongs($c, ${base}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): PolyFold =
    copy(child = newChild)
}
