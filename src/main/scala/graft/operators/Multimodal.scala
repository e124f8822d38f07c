package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travels as an opaque `binary` payload plus typed metadata — the
  * schema, partitioning, and batch shape a 100 TB media pipeline needs.
  *
  * The AUDIO kind is decoded FOR REAL: payloads are RIFF/WAVE containers
  * (16-bit PCM) and [[decodeWav]] is a genuine chunk-walking parser that
  * validates magics, extracts the format block, and computes amplitude
  * features from the PCM frames. Image/video stay STUBBED (no codec
  * libraries in this environment): [[decodeStub]] derives a deterministic
  * fake feature vector from the payload bytes. Swap `decodeStub` for a real
  * decoder (JNI codec, ONNX runtime, subprocess) — everything around it
  * (schema, partition-wise batching, feature schema) is real and tested.
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

  /** Parsed WAV facts — everything below comes from actually reading the
    * container, not from row metadata.
    */
  final case class WavInfo(
      sampleRate: Int, nSamples: Int, peak: Int, rms: Double, zeroCrossings: Int)

  // --------------------------------------------------------------- synthesis

  /** Minimal RIFF/WAVE encoder (mono 16-bit PCM) — the synthetic stand-in for
    * real audio files landed by `spark.read.format("binaryFile")`.
    */
  def wavBytes(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)             // PCM
      .putShort(1)             // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)  // byte rate
      .putShort(2)             // block align
      .putShort(16)            // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    bb.array()
  }

  /** Deterministic PCM tone for doc `id`: a 440·(1 + id%5) Hz sine at a
    * per-doc amplitude. Seeded purely by the row key so reruns and partition
    * layouts agree.
    */
  def pcmSamples(id: Long, n: Int, sampleRate: Int): Array[Short] = {
    val freq = 440.0 * (1 + (id % 5))
    val amp = 8000 + (id % 7) * 3000
    Array.tabulate(n)(t =>
      (math.sin(2 * math.Pi * freq * t / sampleRate) * amp).toShort)
  }

  /** Synthesize a deterministic media table from `documents`. Audio rows get
    * a REAL WAV container (decoded for real downstream); image/video keep the
    * text bytes as an opaque stand-in payload. Typed map instead of Column
    * expressions — this is the data-generation stand-in for a binaryFile
    * scan, not a hot-path operator.
    */
  def mediaTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("n_chars").cast("long"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val kind =
          if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
        val sr = if (kind == "audio") 16000 else 0
        val payload =
          if (kind == "audio") wavBytes(sr, pcmSamples(id, (nChars % 480 + 48).toInt, sr))
          else text.getBytes("UTF-8")
        MediaRow(id, kind, payload,
          (nChars % 640 + 64).toInt, (nChars % 480 + 48).toInt, sr)
      }.toDF()
  }

  // ----------------------------------------------------------------- decode

  /** REAL WAV decode: walk the RIFF chunk list (magic checks, chunk-size
    * skips — not fixed offsets, so extra chunks like LIST/INFO are handled),
    * read the fmt block, then one pass over the 16-bit PCM frames for peak,
    * RMS, and zero-crossing count.
    */
  def decodeWav(payload: Array[Byte]): WavInfo = {
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    def fourCC(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(fourCC() == "RIFF", "not a RIFF container")
    bb.getInt // riff size
    require(fourCC() == "WAVE", "not a WAVE file")
    var sampleRate = 0
    var bitsPerSample = 0
    var channels = 0
    var info: WavInfo = null
    while (info == null && bb.remaining() >= 8) {
      val id = fourCC()
      val size = bb.getInt
      id match {
        case "fmt " =>
          val fmtEnd = bb.position() + size
          val audioFormat = bb.getShort
          require(audioFormat == 1, s"not PCM (format $audioFormat)")
          channels = bb.getShort
          sampleRate = bb.getInt
          bb.getInt   // byte rate
          bb.getShort // block align
          bitsPerSample = bb.getShort
          require(bitsPerSample == 16, s"only 16-bit PCM supported, got $bitsPerSample")
          bb.position(fmtEnd)
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt chunk")
          val n = size / 2
          var i = 0
          var peak = 0
          var sumSq = 0.0
          var zc = 0
          var prevSign = 0
          while (i < n) {
            val s = bb.getShort.toInt
            val a = math.abs(s)
            if (a > peak) peak = a
            sumSq += s.toDouble * s
            val sign = java.lang.Integer.signum(s)
            if (sign != 0) {
              if (prevSign != 0 && sign != prevSign) zc += 1
              prevSign = sign
            }
            i += 1
          }
          info = WavInfo(sampleRate, n / math.max(channels, 1), peak,
            if (n > 0) math.sqrt(sumSq / n) else 0.0, zc)
        case _ =>
          bb.position(bb.position() + size + (size & 1)) // chunks are word-aligned
      }
    }
    require(info != null, "no data chunk found")
    info
  }

  /** Audio features from the REAL decode: [sample_rate, n_samples,
    * peak/32767, rms/32767, zero-crossing rate, duration_sec], zero-padded
    * to `dim`.
    */
  def decodeWavFeatures(row: MediaRow, dim: Int): MediaFeatures = {
    val w = decodeWav(row.payload)
    val base = Array[Float](
      w.sampleRate.toFloat, w.nSamples.toFloat,
      w.peak / 32767.0f, (w.rms / 32767.0).toFloat,
      if (w.nSamples > 1) w.zeroCrossings.toFloat / (w.nSamples - 1) else 0.0f,
      if (w.sampleRate > 0) w.nSamples.toFloat / w.sampleRate else 0.0f)
    MediaFeatures(row.media_id, row.kind, row.payload.length.toLong,
      java.util.Arrays.copyOf(base, math.max(dim, base.length)))
  }

  /** STUB decoder for the kinds without an in-container codec — a real
    * implementation would decode `payload` and run a feature extractor. The
    * fake is deterministic in the payload bytes so tests and reruns agree.
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

  /** Per-row dispatch: audio decodes for real, image/video fall back to the
    * stub until a codec is wired in.
    */
  def decodeOne(row: MediaRow, dim: Int): MediaFeatures = row.kind match {
    case "audio" => decodeWavFeatures(row, dim)
    case _       => decodeStub(row, dim)
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
          batch.map(decodeOne(_, dim))
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
