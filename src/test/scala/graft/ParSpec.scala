package graft

import graft.operators.Par
import org.apache.spark.sql.functions._

/** Pins for the width adapter's GATE (r19): when it fires, when it is the
  * identity, and that firing never changes values — the properties every
  * widen call site relies on.
  */
class ParSpec extends SparkSpec {
  import spark.implicits._

  test("starvedWidth fires on a byte-starved local scan, at session width") {
    val docs = Tables.read(spark, sf("0.001"), "documents")
    val width = spark.sessionState.conf.numShufflePartitions
    assert(Par.starvedWidth(docs) == width)
    // and the widen actually changes the partition count, not the rows
    val base = docs.select("doc_id").as[Long].collect().sorted.toSeq
    val wide = Par.widenBy(docs, col("doc_id"))
    assert(wide.rdd.getNumPartitions == width)
    assert(wide.select("doc_id").as[Long].collect().sorted.toSeq == base)
  }

  test("starvedWidth is conservative: fileless relations pass through") {
    val mem = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(Par.starvedWidth(mem) == 0)
    assert(Par.widen(mem) eq mem) // identity, no extra exchange planned
    assert(Par.widenBy(mem, col("doc_id")) eq mem)
  }

  test("starvedWidth is the identity when the scan already fills the width") {
    // shrink the split size until the tiny fixture file counts as "wide
    // enough" — the 100 TB shape in miniature: bytes ≥ width × split and
    // the plan's own size estimate agrees, so NO extra exchange
    val docs = Tables.read(spark, sf("0.001"), "documents")
    val old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1")
      assert(Par.starvedWidth(docs) == 0)
      assert(Par.widen(docs) eq docs)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", old)
  }
}
