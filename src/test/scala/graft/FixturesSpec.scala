package graft

import org.apache.spark.sql.types._

/** Schema contract for the driver-generated fixtures (TESTDATA.md).
  *
  * The fixtures have been re-encoded under the tree twice (events.ts:
  * nanos-as-long → timestamp[us] NTZ between rounds 7 and 8), each time
  * breaking whole suites with opaque analysis errors. This spec makes the
  * boundary explicit: it opens every sf0.001 table and asserts the column
  * names + the engine-side types the operators rely on, so the next
  * re-encode fails ONE targeted test with a readable diff instead of nine
  * suites deep inside query analysis.
  *
  * Only load-bearing types are pinned exactly (ids, coordinates, text,
  * timestamps); integer width drift (int32 vs int64) on incidental columns
  * is tolerated the same way the driver's oracle hash tolerates it.
  */
class FixturesSpec extends SparkSpec {

  private def schemaOf(table: String): StructType =
    Tables.read(spark, sf("0.001"), table).schema

  private def assertCols(table: String, expect: (String, DataType)*): Unit = {
    val s = schemaOf(table)
    assert(s.fieldNames.toSeq == expect.map(_._1),
      s"$table column names drifted: got ${s.fieldNames.mkString(",")}")
    for ((name, dt) <- expect)
      assert(s(name).dataType == dt,
        s"$table.$name expected $dt, fixture now reads as ${s(name).dataType}")
  }

  private def intish(table: String, cols: String*): Unit = {
    val s = schemaOf(table)
    for (c <- cols)
      assert(Seq(IntegerType, LongType).contains(s(c).dataType),
        s"$table.$c expected an integer type, got ${s(c).dataType}")
  }

  test("TPC-H-ish dimension tables keep their contract") {
    assertCols("region", "r_regionkey" -> IntegerType, "r_name" -> StringType)
    assertCols("nation", "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType)
    assertCols("customer", "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType)
    assertCols("supplier", "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)
    assertCols("part", "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType)
  }

  test("orders / lineitem keep key + measure types (timestamps may be NTZ)") {
    val o = schemaOf("orders")
    assert(o.fieldNames.toSeq == Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"))
    assert(o("o_orderkey").dataType == LongType)
    assert(o("o_custkey").dataType == LongType)
    assert(o("o_totalprice").dataType == DoubleType,
      "o_totalprice feeds the YH coordinate binding — must stay double")
    assert(Seq(TimestampType, TimestampNTZType, DateType)
      .contains(o("o_orderdate").dataType),
      s"o_orderdate unexpected type ${o("o_orderdate").dataType}")

    val l = schemaOf("lineitem")
    assert(l.fieldNames.toSeq == Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate"))
    for (c <- Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      assert(l(c).dataType == DoubleType, s"lineitem.$c must stay double")
    intish("lineitem", "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
  }

  test("documents / embeddings keep the LLM-pipeline contract") {
    assertCols("documents", "doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType)
    val e = schemaOf("embeddings")
    assert(e.fieldNames.toSeq == Seq("vec_id", "embedding", "label"))
    assert(e("vec_id").dataType == LongType)
    assert(e("embedding").dataType == ArrayType(FloatType),
      s"embedding must read as array<float>, got ${e("embedding").dataType} — " +
        "every ANN / dedup_embcos / PQ operator casts from this")
    intish("embeddings", "label")
  }

  test("events reads through Tables.readEvents as TIMESTAMP, any encoding") {
    val ev = Tables.readEvents(spark, sf("0.001"))
    assert(ev.schema.fieldNames.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(ev.schema("ts").dataType == TimestampType,
      s"readEvents must normalize ts to TIMESTAMP; got ${ev.schema("ts").dataType}")
    assert(ev.schema("event_id").dataType == LongType)
    assert(ev.schema("user_id").dataType == LongType)
    assert(ev.schema("value").dataType == DoubleType)
    // The exact expression every events operator leans on must analyze AND
    // produce whole microseconds (the µs-instant contract both engines share).
    import org.apache.spark.sql.functions._
    val micros = ev.select(expr("unix_micros(ts)").as("us"))
      .agg(min("us"), max("us")).head()
    assert(micros.getLong(0) > 0L, "unix_micros(ts) must be positive epochs")
  }

  test("yhEvents 3-D binding analyzes and yields finite coordinates") {
    val yh = Tables.yhEvents(spark, sf("0.001"))
    val row = yh.limit(1).head()
    val y = row.getSeq[Double](1)
    assert(y.length == 3 && y.forall(d => !d.isNaN && !d.isInfinite))
  }
}
