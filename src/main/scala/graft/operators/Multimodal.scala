package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travels as an opaque `binary` payload plus typed metadata — the
  * schema, partitioning, and batch shape a 100 TB media pipeline needs. The
  * actual codec step is STUBBED (no image/audio libraries in this
  * environment): [[decodeStub]] derives a deterministic fake feature vector
  * from the payload bytes. Swap `decodeStub` for a real decoder (JNI codec,
  * ONNX runtime, subprocess) — everything around it (schema, partition-wise
  * batching, feature schema) is real and tested.
  *
  * Scale notes: decode runs via `mapPartitions` so a real decoder amortizes
  * model/codec initialization once per partition (NOT per row), and media
  * rows are `repartition`ed first so decode parallelism is independent of the
  * source file layout. Only fixed-size features leave the executor.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  /** Decoded features: fixed-size vector per media item. */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, features: Array[Float])

  /** Synthesize a deterministic media table from `documents` (payload = text
    * bytes; metadata derived from doc fields). Stands in for
    * `spark.read.format("binaryFile")` / a real object-store manifest.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 640 + 64).cast("int").as("width"),
      (col("n_chars") % 480 + 48).cast("int").as("height"),
      when(col("doc_id") % 3 === 1, 16000).otherwise(0).cast("int").as("sample_rate"))

  /** STUB decoder — a real implementation would decode `payload` with a
    * codec and run a feature extractor. This fake is deterministic in the
    * payload bytes so tests and reruns agree.
    */
  def decodeStub(row: MediaRow, dim: Int): MediaFeatures = {
    val feats = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < row.payload.length) { h = h * 31 + row.payload(i); i += 1 }
    var d = 0
    while (d < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      feats(d) = ((h >>> 40).toInt % 1000) / 1000.0f
      d += 1
    }
    MediaFeatures(row.media_id, row.kind, row.payload.length.toLong, feats)
  }

  /** Partition-wise batched decode: repartition for even decode parallelism,
    * then one iterator pass per partition with `batchSize`-row micro-batches
    * (the shape a vectorized decoder / GPU feature extractor wants).
    */
  def decodeFeatures(media: DataFrame, dim: Int = 8, batchSize: Int = 32,
      parallelism: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val parts = if (parallelism > 0) parallelism
      else spark.sparkContext.defaultParallelism
    media.as[MediaRow]
      .repartition(parts, col("media_id"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // real decoders process `batch` as one vectorized call
          batch.map(decodeStub(_, dim))
        }
      }
  }

  /** Feature post-processing back in relational land: per-kind stats over
    * the decoded (fixed-size) features.
    */
  def featureStats(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n"), sum("n_bytes").as("total_bytes"),
        avg(element_at(col("features"), 1)).as("mean_f0"))
}
