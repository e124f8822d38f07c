package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-min sketch over `array<long>` id rows — the classic sublinear
  * frequency summary, as ONE custom distributed aggregate: every partition
  * builds a d×w count matrix from its rows (map-side partial), matrices
  * merge by elementwise add (exact, order-independent), and a token's
  * estimate is `min` over its d buckets — an upper bound on the true count
  * that collisions can only inflate, never deflate.
  *
  * The hash family is TRANSPARENT (fixed `(id·A(i)+B(i)) mod P mod w`
  * literals, exported below) rather than Spark's built-in
  * `count_min_sketch`'s opaque binary: estimates stay relational
  * (`native.cms_estimate` is plain element_at/least over the matrix — no
  * driver round-trip, no UDF) and the DuckDB oracle can re-derive the same
  * bucket sums hash-exactly. At 100 TB the sketch is the point: d·w longs
  * of fixed state summarize any number of rows, and the merge tree is the
  * same partial/final shape as any built-in aggregate.
  */
case class CmsSketch(
    child: Expression,
    w: Int,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(w >= 1 && d >= 1 && d <= CmsSketch.A.length,
    s"need 1 <= d <= ${CmsSketch.A.length} hash rows and w >= 1, got d=$d w=$w")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cms_sketch requires array<bigint>, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      val n = a.numElements()
      var j = 0
      while (j < n) {
        val id = a.getLong(j)
        var i = 0
        while (i < d) {
          buf(i * w + CmsSketch.bucket(id, i, w)) += 1
          i += 1
        }
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < d * w) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * d * w)
    var i = 0
    while (i < d * w) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](d * w)
    var i = 0
    while (i < d * w) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketch =
    copy(child = newChildren.head)
}

object CmsSketch {
  /** Transparent pairwise hash family `(id·A(i)+B(i)) mod P mod w`. Inputs
    * are poly_hash ids in [0, P), A ≤ ~1e6, so `id·A` stays far inside the
    * long range. Shared verbatim by the estimator column and the DuckDB
    * oracle generator.
    */
  val P: Long = 1000000007L
  val A: Array[Long] = Array(1000003L, 999983L, 824633L, 611953L)
  val B: Array[Long] = Array(12289L, 48611L, 90001L, 7919L)

  def bucket(id: Long, i: Int, w: Int): Int =
    (((id * A(i) + B(i)) % P) % w).toInt
}
