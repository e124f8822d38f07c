package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) as ONE custom
  * distributed aggregate: every partition folds its ids into `m = 2^p`
  * one-byte registers (map-side partial), register arrays merge by
  * elementwise MAX — exact, order- and duplicate-insensitive — and the
  * cardinality estimate is derived from the register array RELATIONALLY
  * (see `native.hll_estimate`: a codegen'd `aggregate` fold, no driver
  * round-trip).
  *
  * Like [[CmsSketch]], the hash is TRANSPARENT (a fixed 32-bit
  * multiply-xorshift avalanche, exported below) rather than Spark's opaque
  * `approx_count_distinct` HLL++ binary, so the DuckDB oracle re-derives
  * the SAME registers hash-exactly with plain integer SQL, and a sketch
  * built by any engine can be merged with ours. At 100 TB the sketch is the
  * point: m bytes of fixed state summarize any number of rows per group,
  * partials combine map-side exactly like a built-in aggregate, and
  * register arrays for different slices union by `max` — the per-slice
  * sketches ARE the global sketch (pinned in PlansSpec), so rollups over
  * billions of rows never rescan.
  *
  * Estimate contract: the RAW HLL estimator `alpha_m * m^2 / Σ 2^-M_j`,
  * valid for n ≳ 2.5·m (callers size p so groups clear that bar; the
  * zero-register count rides along for anyone applying linear counting).
  * The denominator is kept as the EXACT integer `Σ 2^(33-M_j)` (registers
  * never exceed 33−p bits... rho ≤ 32−p+1, so every term is an exact long
  * and the double conversion of the ≤2^41 sum is lossless), making the
  * estimate a single correctly-rounded IEEE division — bit-identical on any
  * engine, hence oracle-hashable.
  */
case class HllSketch(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"need 4 <= p <= 16, got p=$p")
  private def m: Int = 1 << p

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hll_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hll_sketch requires a bigint id, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = HllSketch.hash32(v.asInstanceOf[Long])
      val bucket = (h & (m - 1)).toInt
      val rho = HllSketch.rho(h >>> p, 32 - p)
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < b1.length) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Int](buf.length)
    var i = 0
    while (i < buf.length) { out(i) = buf(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketch =
    copy(child = newChildren.head)
}

object HllSketch {
  /** Transparent 32-bit avalanche hash over a NONNEGATIVE long id: fold the
    * high word in with xor, then three multiply-xorshift rounds, all
    * arithmetic mod 2^32. Every step is plain integer SQL (`xor`, `>>`, and
    * a 128-bit-safe `(h*K) % 2^32`), shared verbatim with the DuckDB oracle
    * generator (`OracleSql.hllHashLayers`).
    */
  def hash32(x: Long): Long = {
    var h = (x ^ (x >>> 32)) & 0xFFFFFFFFL
    h = (h * 2654435761L) & 0xFFFFFFFFL // Knuth's 2^32/phi
    h ^= h >>> 16
    h = (h * 2246822519L) & 0xFFFFFFFFL // xxhash PRIME32_2
    h ^= h >>> 13
    h = (h * 3266489917L) & 0xFFFFFFFFL // xxhash PRIME32_4
    h ^= h >>> 16
    h
  }

  /** Rank of the first set bit of the w-bit value v, counting from the
    * left: `w - bitlen(v) + 1`, i.e. leading zeros + 1; `w + 1` when v = 0.
    * Matches the oracle's `(w+1) - length(printf('%b', v))` form.
    */
  def rho(v: Long, w: Int): Int = w + 1 - (64 - java.lang.Long.numberOfLeadingZeros(v))
}
