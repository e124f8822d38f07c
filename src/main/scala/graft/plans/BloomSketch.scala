package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bloom filter over nonnegative bigint ids as ONE custom distributed
  * aggregate — the membership sketch completing graft's transparent-sketch
  * family ([[CmsSketch]] frequency, [[HllSketch]] distinct, KMV overlap):
  * every partition ORs its ids' bits into an m-bit word array (map-side
  * partial), arrays merge by elementwise OR (exact, order- and
  * duplicate-insensitive), and membership is `all k bits set` — no false
  * negatives, false positives at the classic (1-e^{-kn/m})^k rate.
  *
  * Bit positions use Kirsch-Mitzenmacher double hashing over the SAME
  * transparent 32-bit avalanche as [[HllSketch]]:
  * `bit_i = (h1 + i·h2) mod m` with `h1 = hash32(x)`,
  * `h2 = hash32(x + 0x9E3779B9) | 1` (odd, so the probe sequence cycles
  * through all residues even for composite m). Spark's own
  * `bloom_filter_agg` is an opaque binary; keeping the layout transparent
  * means the DuckDB oracle rebuilds the EXACT words with integer SQL
  * (`bit_or(1 << off)` per word), persisted filters are engine-portable,
  * and `might_contain` stays a plain relational expression
  * ([[BloomMightContain]], codegen'd). The word layout is 32-BIT words in
  * longs (values < 2^32): no value ever touches the sign bit, so every
  * engine's integer SQL (shift, bit_or, sum) reproduces the words without
  * signed-overflow contortions — the price is 2x array length, noise next
  * to portability. At 100 TB the filter is the point: m bits of fixed
  * state gate a corpus-scale membership probe (decontamination, URL
  * blocklists, already-ingested checks) without a join against the full
  * set.
  */
case class BloomSketch(
    child: Expression,
    mBits: Int,
    kHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(mBits >= 32 && mBits % 32 == 0,
    s"mBits must be a positive multiple of 32, got $mBits")
  require(kHashes >= 1 && kHashes <= 16, s"need 1 <= k <= 16, got $kHashes")
  private def words: Int = mBits / 32

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_sketch requires a bigint id, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      val h1 = HllSketch.hash32(x)
      val h2 = HllSketch.hash32(x + BloomSketch.H2Offset) | 1L
      var i = 0
      while (i < kHashes) {
        val bit = (((h1 + i * h2) & 0xFFFFFFFFL) % mBits).toInt
        buf(bit >>> 5) |= 1L << (bit & 31)
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](words)
    var i = 0
    while (i < words) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomSketch =
    copy(child = newChildren.head)
}

object BloomSketch {
  /** Kirsch-Mitzenmacher offset constant (2^32/phi — golden-ratio step). */
  val H2Offset: Long = 0x9E3779B9L

  /** h2 is forced ODD so `(h1 + i·h2) mod m` never collapses the probe
    * sequence (m is a power-of-two multiple of 64 in practice).
    */
  def bitPos(x: Long, i: Int, mBits: Int): Int = {
    val h1 = HllSketch.hash32(x)
    val h2 = HllSketch.hash32(x + H2Offset) | 1L
    (((h1 + i * h2) & 0xFFFFFFFFL) % mBits).toInt
  }
}

/** Codegen'd Bloom membership probe over a [[BloomSketch]] word array:
  * true iff all k double-hashed bits are set (no false negatives; false
  * positives at the filter's design rate). The hash runs in JVM long
  * arithmetic inside whole-stage codegen — no Column-side multiply that
  * could trip ANSI overflow checks — and the probe inlines next to the
  * scan, so a broadcast filter gates rows without any join.
  */
case class BloomMightContain(
    left: Expression, // array<long> 32-bit words
    right: Expression, // bigint id
    mBits: Int,
    kHashes: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(mBits >= 32 && mBits % 32 == 0 && kHashes >= 1 && kHashes <= 16,
    s"bad bloom geometry mBits=$mBits k=$kHashes")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires (array<bigint>, bigint), got " +
        s"${l.simpleString} / ${r.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(w: Any, id: Any): Any = {
    val words = w.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val x = id.asInstanceOf[Long]
    val h1 = HllSketch.hash32(x)
    val h2 = HllSketch.hash32(x + BloomSketch.H2Offset) | 1L
    var i = 0
    while (i < kHashes) {
      val bit = (((h1 + i * h2) & 0xFFFFFFFFL) % mBits).toInt
      if ((words.getLong(bit >>> 5) & (1L << (bit & 31))) == 0L) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (w, id) => {
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i")
      val bit = ctx.freshName("bit")
      s"""
         |long $h1 = graft.plans.HllSketch.hash32($id);
         |long $h2 = graft.plans.HllSketch.hash32($id + ${BloomSketch.H2Offset}L) | 1L;
         |${ev.value} = true;
         |for (int $i = 0; $i < $kHashes; $i++) {
         |  long $bit = (($h1 + $i * $h2) & 0xFFFFFFFFL) % $mBits;
         |  if (($w.getLong((int)($bit >>> 5)) & (1L << (int)($bit & 31))) == 0L) {
         |    ${ev.value} = false; break;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
