package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All `numHashes` MinHash signature values in ONE pass over the shingle-id
  * array.
  *
  * Semantics (bit-identical to the HOF form it replaces, pinned in
  * PlansSpec): `sig[h] = min over ids x of (x·a_h + b_h) mod 2147483647`
  * with the `Dedup.mhA`/`mhB` family (`a_h = 2654435761·(h+1) mod P`,
  * `b_h = 1779033703·(h+1) + 104729 mod P` — ~2³⁰-scale multipliers that
  * genuinely wrap; `a_h·x < 2⁶²` so no Java overflow), Java signed `%` —
  * exactly what Catalyst's non-ANSI `Multiply`/`Remainder` evaluate, so the
  * DuckDB oracle mirror is unchanged. An EMPTY id array yields an array of
  * `numHashes` nulls (what `array_min` over an empty array produces
  * per-hash).
  *
  * Why: the per-hash composition `array_min(transform(ids, …))` is a
  * HigherOrderFunction — CodegenFallback, interpreted — and re-walks the id
  * array once per hash function (16× for the default family), allocating an
  * intermediate array each time. Here the id array is walked once per hash
  * inside one codegen'd call with zero allocations, which removes the
  * signature stage from the dedup_minhash profile entirely.
  */
@ExpressionDescription(
  usage = "_FUNC_(ids, n) - all n MinHash signature mins over the id array in one pass.")
case class MinhashSigs(child: Expression, numHashes: Int) extends UnaryExpression {

  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires array<long>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "minhash_sigs"

  def compute(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    if (n == 0) return new GenericArrayData(Array.fill[Any](numHashes)(null))
    val out = new Array[Any](numHashes)
    var h = 0
    while (h < numHashes) {
      // the Dedup.mhA/mhB family, inlined (parity pinned in PlansSpec)
      val a = (2654435761L * (h + 1)) % 2147483647L
      val b = (1779033703L * (h + 1) + 104729L) % 2147483647L
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (ids.getLong(i) * a + b) % 2147483647L
        if (v < m) m = v
        i += 1
      }
      out(h) = m
      h += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSigs", this, classOf[MinhashSigs].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}

object MinhashSigs {
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  val info: ExpressionInfo = new ExpressionInfo(classOf[MinhashSigs].getName, "minhash_sigs")
}
