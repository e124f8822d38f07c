package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table readers + the reference's `YH` input-adapter contract.
  *
  * The reference decouples its algorithm from storage with a user-redefined
  * view `YH(i, Y)` (reference k-means.sql:7, README.md:34-36): a row key `i`
  * and a coordinate vector `Y` of any dimension. Here the adapter is a plain
  * function `DataFrame => DataFrame` producing `(i: long, Y: array<double>)`;
  * `ArrayType(DoubleType)` keeps the whole engine dimension-generic (the
  * reference needs schema-macro tricks — `untuple`/`COLUMNS('…') APPLY` at
  * k-means.sql:37,44 — to get the same genericity).
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with `ts` normalized to TimestampType (µs), whatever encoding
    * the fixture was written with. Observed encodings so far:
    *  - TIMESTAMP(NANOS) → Spark reads long nanos (via
    *    `spark.sql.legacy.parquet.nanosAsLong=true`, set in every session
    *    builder here); all values are whole microseconds and DuckDB downcasts
    *    the same way, so both engines see identical µs instants. Integer
    *    `div` keeps the conversion exact (nanos exceed 2^53 — no doubles).
    *  - timestamp[us] with isAdjustedToUTC=false → Spark 4 infers
    *    TIMESTAMP_NTZ; every session here pins the timezone to UTC, so a cast
    *    to TimestampType is instant-preserving and DuckDB reads the same file
    *    natively.
    * Any other encoding fails loudly with the observed type, so a future
    * fixture re-encode trips one readable error instead of 9 suites.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // NOT widened (r18 measured): the events family's per-row work is
    // cheap — Par.widen here cost +0.3..+1.7 s per query (the exchange +
    // its sort-before-repartition) with no compute win. See Par scaladoc.
    val raw = read(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case TimestampType => raw
      case other =>
        throw new IllegalStateException(
          s"events.parquet ts column has unsupported type $other; " +
            "expected TIMESTAMP(NANOS) as long, TIMESTAMP_NTZ, or TIMESTAMP " +
            "(fixture re-encoded? extend Tables.readEvents)")
    }
  }

  /** 2-D YH binding over `orders` (o_orderkey is unique; lineitem's composite
    * key is not unique in this synthetic data). Mirrors reference
    * k-means.sql:7 `select i, (x,y) as Y from sourceData`.
    */
  def yhOrders(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "orders").select(
      col("o_orderkey").as("i"),
      array(col("o_totalprice"), (col("o_custkey") % 1009).cast("double")).as("Y"))

  /** N-D YH binding over `embeddings` (64-dim float vectors + ground-truth
    * label) — proves the adapter's dimension genericity (README.md:36).
    */
  def yhEmbeddings(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "embeddings").select(
      col("vec_id").as("i"),
      col("embedding").cast("array<double>").as("Y"))

  /** 3-D YH binding over `events` (hour-of-day, value, user bucket) — a
    * third, mixed-derivation binding proving the adapter works over any
    * relation, including timestamp-derived coordinates. Integer µs math keeps
    * the hour exact (`div`, not float division) so the oracle mirrors it.
    */
  def yhEvents(spark: SparkSession, dir: String): DataFrame =
    readEvents(spark, dir).select(
      col("event_id").as("i"),
      array(
        expr("CAST((unix_micros(ts) div 3600000000) % 24 AS DOUBLE)"),
        col("value"),
        (col("user_id") % 101).cast("double")).as("Y"))

  /** SQL fragment used by every k-means oracle: same projection as
    * [[yhOrders]], exploded to scalar columns for ANSI-SQL friendliness.
    */
  val yhOrdersSql: String =
    "yh AS (SELECT o_orderkey AS i, o_totalprice AS x, CAST(o_custkey % 1009 AS DOUBLE) AS y FROM orders)"

  /** Oracle mirror of [[yhEvents]] (DuckDB `//` = integer division). */
  val yhEventsSql: String =
    "yhe AS (SELECT event_id AS i, CAST((epoch_us(ts) // 3600000000) % 24 AS DOUBLE) AS x, " +
      "value AS y, CAST(user_id % 101 AS DOUBLE) AS z FROM events)"
}
