package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native twins of the Dedup tokenize/shingle pipelines.
  *
  * The HOF compositions (`array_distinct(transform(sequence(...), k ->
  * concat_ws(" ", slice(toks, k, n))))` and friends) are CodegenFallback in
  * Spark — every element bounces through interpreted lambda eval with
  * UnsafeArrayData boxing, and the shingle stage alone burns ~430 CPU-s at
  * sf0.1 across the ngram/minhash dedup queries. These expressions compute
  * the same values in one straight-line JVM pass per row.
  *
  * VALUE PARITY (oracle-critical):
  *  - tokens = `split(text, " ")` semantics: split on every single space,
  *    keeping empty tokens (including trailing — Java `split(" ", -1)`).
  *  - shingle k (1-based, k ≤ max(len−n+1, 1)) = tokens[k−1 .. k+n−2] joined
  *    by " ", truncated at the end like `slice`.
  *  - distinct keeps FIRST occurrence order, like `array_distinct`.
  *  - ids hash with [[PolyHash.hash]], exactly `Dedup.tokenId`.
  */
object ShingleOps {

  private def tokens(s: UTF8String): Array[String] = s.toString.split(" ", -1)

  private def distinctShingles(s: UTF8String, n: Int): java.util.LinkedHashSet[String] = {
    val toks = tokens(s)
    val count = math.max(toks.length - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[String]
    var k = 0
    while (k < count) {
      val end = math.min(k + n, toks.length)
      val sb = new java.lang.StringBuilder
      var i = k
      while (i < end) {
        if (i > k) sb.append(' ')
        sb.append(toks(i))
        i += 1
      }
      seen.add(sb.toString)
      k += 1
    }
    seen
  }

  /** Distinct word n-gram shingles, first-occurrence order. */
  def shingles(s: UTF8String, n: Int): ArrayData = {
    val seen = distinctShingles(s, n)
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** Distinct [[PolyHash.hash]] ids of the distinct shingles — the fused
    * `array_distinct(transform(shingles, poly_hash))`.
    */
  def shingleIds(s: UTF8String, n: Int): ArrayData = {
    val seen = distinctShingles(s, n)
    val ids = new java.util.LinkedHashSet[java.lang.Long]
    val it = seen.iterator()
    while (it.hasNext) ids.add(PolyHash.hash(it.next()))
    val out = new Array[Any](ids.size)
    val it2 = ids.iterator()
    var j = 0
    while (it2.hasNext) { out(j) = it2.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  /** Per-token [[PolyHash.hash]] ids, duplicates kept — the fused
    * `transform(split(text, " "), poly_hash)`.
    */
  def tokenIds(s: UTF8String): ArrayData = {
    val toks = tokens(s)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = PolyHash.hash(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** ALL word n-grams in position order, duplicates kept, NO truncated tail
    * gram — a text shorter than n tokens yields an empty array. Gram at
    * 1-based position k covers tokens k..k+n−1; `posexplode` over this array
    * recovers (position, gram) postings without any HOF lambda (the
    * interpreted `slice`-capture trap) and without shuffling tokens through
    * a window. Non-distinct by design: span extraction needs every
    * occurrence's position.
    */
  def grams(s: UTF8String, n: Int): ArrayData = {
    val toks = tokens(s)
    val count = math.max(toks.length - (n - 1), 0)
    val out = new Array[Any](count)
    var k = 0
    while (k < count) {
      val sb = new java.lang.StringBuilder
      var i = k
      while (i < k + n) {
        if (i > k) sb.append(' ')
        sb.append(toks(i))
        i += 1
      }
      out(k) = UTF8String.fromString(sb.toString)
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Content-defined chunk partition — the fused twin of
    * `Dedup.cdcChunkArray`'s `aggregate(zip_with(tokens, token_ids, ...))`
    * fold (a boundary falls AFTER every token whose [[PolyHash.hash]] ≡ 0
    * mod `mod`; chunks are the space-joined runs between boundaries, with a
    * trailing partial chunk kept). The HOF fold is CodegenFallback and was
    * the dedup_cdc hot spot (2.4× its floor in round 11); this is one
    * straight-line pass per row. Value parity is exact, including the
    * `cur = ""` sentinel semantics of the original fold (an empty token
    * always hashes to 0, so it always closes a chunk — the only state in
    * which the sentinel could be ambiguous never survives a step).
    */
  def cdcChunks(s: UTF8String, mod: Int): ArrayData = {
    val toks = tokens(s)
    val chunks = new java.util.ArrayList[Any]
    var cur = ""
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val ncur = if (cur.isEmpty) t else cur + " " + t
      if (PolyHash.hash(t) % mod == 0) {
        chunks.add(UTF8String.fromString(ncur)); cur = ""
      } else cur = ncur
      i += 1
    }
    if (cur.nonEmpty) chunks.add(UTF8String.fromString(cur))
    new GenericArrayData(chunks.toArray)
  }

  /** Distinct lowercase character trigrams, first-occurrence order — the
    * fused `array_distinct(transform(sequence(1, length(lower(t)) - 2),
    * i -> substring(lower(t), i, 3)))` incl. its len<3 → empty guard.
    * Lowercasing and char (not byte) windows via UTF8String, exactly like
    * Spark's `lower`/`substring`.
    */
  def charTrigrams(s: UTF8String): ArrayData = {
    val lower = s.toLowerCase
    val n = lower.numChars()
    val seen = new java.util.LinkedHashSet[UTF8String]
    var i = 1
    while (i <= n - 2) {
      seen.add(lower.substringSQL(i, 3))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}

private[plans] abstract class ShingleExpressionBase extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.simpleString}")
  }
}

/** `word_shingles(text, n)` → `array<string>` distinct word n-grams. */
case class WordShingles(child: Expression, n: Int) extends ShingleExpressionBase {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(v: Any): Any =
    ShingleOps.shingles(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleOps.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  val info: ExpressionInfo = new ExpressionInfo(classOf[WordShingles].getName, "word_shingles")
}

/** `shingle_ids(text, n)` → `array<long>` distinct poly_hash shingle ids. */
case class ShingleIds(child: Expression, n: Int) extends ShingleExpressionBase {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_ids"

  override def nullSafeEval(v: Any): Any =
    ShingleOps.shingleIds(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleOps.shingleIds($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleIds =
    copy(child = newChild)
}

object ShingleIds {
  val info: ExpressionInfo = new ExpressionInfo(classOf[ShingleIds].getName, "shingle_ids")
}

/** `word_grams(text, n)` → `array<string>` positional n-grams (duplicates
  * kept, empty when the text has fewer than n tokens).
  */
case class WordGrams(child: Expression, n: Int) extends ShingleExpressionBase {
  require(n >= 1, s"gram width must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_grams"

  override def nullSafeEval(v: Any): Any =
    ShingleOps.grams(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleOps.grams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
}

object WordGrams {
  val info: ExpressionInfo = new ExpressionInfo(classOf[WordGrams].getName, "word_grams")
}

/** `token_ids(text)` → `array<long>` per-token poly_hash ids (duplicates kept). */
case class TokenIds(child: Expression) extends ShingleExpressionBase {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_ids"

  override def nullSafeEval(v: Any): Any =
    ShingleOps.tokenIds(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleOps.tokenIds($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenIds =
    copy(child = newChild)
}

object TokenIds {
  val info: ExpressionInfo = new ExpressionInfo(classOf[TokenIds].getName, "token_ids")
}

/** `cdc_chunks(text, mod)` → `array<string>` content-defined chunks
  * (boundary after every token with poly_hash ≡ 0 mod `mod`).
  */
case class CdcChunks(child: Expression, mod: Int) extends ShingleExpressionBase {
  require(mod >= 1, s"cdc mod must be >= 1, got $mod")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(v: Any): Any =
    ShingleOps.cdcChunks(v.asInstanceOf[UTF8String], mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleOps.cdcChunks($c, $mod)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  val info: ExpressionInfo = new ExpressionInfo(classOf[CdcChunks].getName, "cdc_chunks")
}

/** `char_trigrams(text)` → `array<string>` distinct lowercase char trigrams. */
case class CharTrigrams(child: Expression) extends ShingleExpressionBase {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_trigrams"

  override def nullSafeEval(v: Any): Any =
    ShingleOps.charTrigrams(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleOps.charTrigrams($c)")

  override protected def withNewChildInternal(newChild: Expression): CharTrigrams =
    copy(child = newChild)
}

object CharTrigrams {
  val info: ExpressionInfo = new ExpressionInfo(classOf[CharTrigrams].getName, "char_trigrams")
}
