package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, AggregateFunc, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util.OptionalLong

/** DataSource V2 connector for the reference's `numbers(N)` table function
  * (clickhouse-k-means k-means.sql:6 seeds its demo data from
  * `system.numbers`): a generated table of consecutive integers, produced
  * engine-side rather than materialized.
  *
  * This is the full connector surface, not a `spark.range` alias:
  *
  *   - '''split planning''' — the `[start, end)` interval is carved into
  *     `splits` contiguous [[NumbersRange]] input partitions, so a
  *     1000-executor cluster reads 1000 disjoint ranges with zero
  *     coordination;
  *   - '''filter pushdown''' ([[SupportsPushDownFilters]]) — range
  *     predicates on `i` tighten the interval BEFORE splitting, so
  *     `WHERE i BETWEEN a AND b` plans only the surviving sub-ranges
  *     (row-exact, not just partition-grained: the residual range IS the
  *     predicate), and fully-handled filters are consumed, not re-evaluated;
  *   - '''column pruning''' ([[SupportsPushDownRequiredColumns]]) — the
  *     derived `hex` column is never formatted when the query only reads
  *     `i` (and a `count(*)` scan emits zero-field rows);
  *   - '''statistics''' ([[SupportsReportStatistics]]) — exact row count
  *     and a size estimate from the residual range, which lets Spark
  *     auto-broadcast a small numbers table into a join with no hint.
  *
  * Registered as `graft-numbers` via META-INF/services; options: `end`
  * (exclusive, required), `start` (default 0), `splits` (default 8).
  */
class NumbersSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-numbers"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NumbersTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    def opt(k: String, d: Long): Long =
      Option(properties.get(k)).map(_.toLong).getOrElse(d)
    val end = Option(properties.get("end")).map(_.toLong).getOrElse(
      throw new IllegalArgumentException("graft-numbers requires option 'end'"))
    NumbersTable(opt("start", 0L), end, opt("splits", 8L).toInt)
  }
}

object NumbersTable {
  val schema: StructType = StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("hex", StringType, nullable = false)))
}

case class NumbersTable(start: Long, end: Long, splits: Int)
    extends Table with SupportsRead {
  override def name(): String = s"numbers($start, $end)"
  override def schema(): StructType = NumbersTable.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NumbersScanBuilder(start, end, splits)
}

/** Mutable per-scan state: range filters tighten `[lo, hi)`; pruning
  * replaces the projected schema. Both happen before `build()`.
  */
class NumbersScanBuilder(start: Long, end: Long, splits: Int)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {
  private var lo = start
  private var hi = end
  private var accepted = Array.empty[Filter]
  private var projected = NumbersTable.schema
  private var pushedAggs: Option[Seq[AggregateFunc]] = None

  // saturating +1 / clamps keep Long.MaxValue bounds from wrapping
  private def inc(v: Long): Long = if (v == Long.MaxValue) v else v + 1

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition {
      case EqualTo("i", _: Number) => true
      case GreaterThan("i", _: Number) => true
      case GreaterThanOrEqual("i", _: Number) => true
      case LessThan("i", _: Number) => true
      case LessThanOrEqual("i", _: Number) => true
      case IsNotNull("i") | IsNotNull("hex") => true // columns are non-null
      case _ => false
    }
    ours.foreach {
      case EqualTo("i", v: Number) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, inc(v.longValue))
      case GreaterThan("i", v: Number) => lo = math.max(lo, inc(v.longValue))
      case GreaterThanOrEqual("i", v: Number) => lo = math.max(lo, v.longValue)
      case LessThan("i", v: Number) => hi = math.min(hi, v.longValue)
      case LessThanOrEqual("i", v: Number) => hi = math.min(hi, inc(v.longValue))
      case _ => () // IsNotNull: vacuously true
    }
    accepted = ours
    residual // only these need post-scan evaluation
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    projected = requiredSchema

  /** Global COUNT/SUM/MIN/MAX over a consecutive-integer range have closed
    * forms — push them into the scan and answer from arithmetic, reading
    * zero rows. `i` is unique and non-null, so DISTINCT variants coincide
    * with the plain ones and both are accepted. Grouped aggregations are
    * declined (Spark keeps its own aggregation, correct either way).
    */
  private def aggSupported(f: AggregateFunc): Boolean = f match {
    case _: CountStar => true
    case c: Count => isI(c.column) // non-null unique => count == rows
    case m: Min => isI(m.column)
    case m: Max => isI(m.column)
    case s: Sum => isI(s.column)
    case _ => false
  }
  private def isI(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case n: NamedReference => n.fieldNames.sameElements(Array("i"))
      case _ => false
    }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    aggregation.groupByExpressions.isEmpty &&
      aggregation.aggregateExpressions.forall(aggSupported)

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (!supportCompletePushDown(aggregation)) return false
    pushedAggs = Some(aggregation.aggregateExpressions.toSeq)
    true
  }

  override def build(): Scan = {
    val hiC = math.max(lo, hi)
    pushedAggs match {
      case Some(fs) => NumbersAggScan(lo, hiC, fs.map {
        case _: CountStar => "count"
        case _: Count => "count"
        case _: Min => "min"
        case _: Max => "max"
        case _: Sum => "sum"
      })
      case None => NumbersScan(lo, hiC, splits, projected)
    }
  }
}

/** The completely-pushed-down aggregate scan: ONE partition, ONE row,
  * computed from the residual `[lo, hi)` range in O(1). Sum wraps through
  * the 128-bit closed form exactly like 64-bit wrapping addition would
  * (matching Spark's non-ANSI overflow); empty ranges yield count 0 and
  * NULL min/max/sum, matching Spark's global-aggregate semantics.
  */
case class NumbersAggScan(lo: Long, hi: Long, funcs: Seq[String])
    extends Scan with Batch {
  override def readSchema(): StructType = StructType(funcs.zipWithIndex.map {
    case ("count", i) => StructField(s"agg_$i", LongType, nullable = false)
    case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-numbers AGG-PUSHDOWN range=[$lo, $hi) aggs=${funcs.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    Array(NumbersRange(lo, hi))
  override def createReaderFactory(): PartitionReaderFactory =
    NumbersAggReaderFactory(funcs)
}

case class NumbersAggReaderFactory(funcs: Seq[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val NumbersRange(lo, hi) = partition
    val n = math.max(hi - lo, 0L)
    val vals: Array[Any] = funcs.map {
      case "count" => java.lang.Long.valueOf(n)
      case _ if n == 0L => null
      case "min" => java.lang.Long.valueOf(lo)
      case "max" => java.lang.Long.valueOf(hi - 1)
      case "sum" => // exact 128-bit closed form, truncated = 64-bit wrapping
        java.lang.Long.valueOf(
          ((BigInt(lo) + BigInt(hi - 1)) * BigInt(n) / 2).toLong)
    }.toArray
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = new GenericInternalRow(vals)
      override def close(): Unit = ()
    }
  }
}

case class NumbersRange(lo: Long, hi: Long) extends InputPartition

case class NumbersScan(lo: Long, hi: Long, splits: Int, projected: StructType)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = projected
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-numbers range=[$lo, $hi) splits=$splits cols=${projected.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val total = hi - lo
    if (total <= 0) Array.empty
    else {
      val n = math.min(splits.toLong, total).toInt
      // contiguous near-equal chunks; remainder spread over the first few
      (0 until n).map { p =>
        val a = lo + total * p / n
        val b = lo + total * (p + 1) / n
        NumbersRange(a, b): InputPartition
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    NumbersReaderFactory(projected.fieldNames)

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(math.max(hi - lo, 0L) * 24L)
    override def numRows(): OptionalLong = OptionalLong.of(math.max(hi - lo, 0L))
  }
}

case class NumbersReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val NumbersRange(lo, hi) = partition
    new PartitionReader[InternalRow] {
      private var i = lo - 1
      override def next(): Boolean = { i += 1; i < hi }
      override def get(): InternalRow = {
        val vals: Array[Any] = cols.map {
          case "i" => java.lang.Long.valueOf(i)
          case "hex" => UTF8String.fromString(java.lang.Long.toHexString(i))
        }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = ()
    }
  }
}
