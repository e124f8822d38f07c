package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("media table carries binary payloads with typed metadata") {
    val media = Multimodal.mediaTable(Tables.read(spark, sf("0.001"), "documents"))
    val schema = media.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("payload") == "binary")
    assert(schema("kind") == "string" && schema("width") == "int")
    assert(media.count() == 500)
    // payload round-trips the source text
    val r = media.select(col("media_id"), length(col("payload")).as("len"))
      .join(Tables.read(spark, sf("0.001"), "documents"),
        col("media_id") === col("doc_id"))
      .filter(col("len") =!= length(col("text")))
    assert(r.count() == 0)
  }

  test("decode pipeline is deterministic, batched, and partition-parallel") {
    val media = Multimodal.mediaTable(Tables.read(spark, sf("0.001"), "documents"))
    val f1 = Multimodal.decodeFeatures(media, dim = 8, parallelism = 4)
    assert(f1.rdd.getNumPartitions == 4)
    val a = f1.collect().map(f => f.media_id -> f.features.toSeq).toMap
    val b = Multimodal.decodeFeatures(media, dim = 8, parallelism = 2)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(a == b)                       // partitioning-independent
    assert(a.values.forall(_.size == 8)) // fixed feature shape
  }

  test("feature stats roll decoded media back up per kind") {
    val media = Multimodal.mediaTable(Tables.read(spark, sf("0.001"), "documents"))
    val stats = Multimodal.featureStats(Multimodal.decodeFeatures(media))
    val kinds = stats.select("kind").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSet
    assert(kinds == Set("image", "audio", "video"))
  }
}
