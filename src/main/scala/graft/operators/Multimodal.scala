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
  * features from the PCM frames. The IMAGE kind is decoded FOR REAL too:
  * payloads are 24-bit uncompressed BMP containers and [[decodeBmp]] parses
  * the BITMAPFILEHEADER/BITMAPINFOHEADER (magic, data offset, geometry,
  * bit depth), then walks the bottom-up padded pixel rows for per-channel
  * means and luma statistics. VIDEO stays STUBBED (no codec libraries in
  * this environment): [[decodeStub]] derives a deterministic fake feature
  * vector from the payload bytes. Swap `decodeStub` for a real decoder
  * (JNI codec, ONNX runtime, subprocess) — everything around it (schema,
  * partition-wise batching, feature schema) is real and tested.
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

  /** Minimal 24-bit uncompressed BMP encoder (bottom-up rows, 4-byte row
    * padding) — the synthetic stand-in for real image files landed by
    * `spark.read.format("binaryFile")`. `rgb(x, y)` returns `0xRRGGBB`.
    */
  def bmpBytes(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val stride = (width * 3 + 3) / 4 * 4
    val dataLen = stride * height
    val bb = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putShort(0).putShort(0).putInt(54)      // reserved, pixel-data offset
    bb.putInt(40)                              // BITMAPINFOHEADER
      .putInt(width).putInt(height)
      .putShort(1)                             // planes
      .putShort(24)                            // bits per pixel
      .putInt(0)                               // BI_RGB (uncompressed)
      .putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1                         // bottom-up row order
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val c = rgb(x, y)
        bb.put((c & 0xff).toByte).put(((c >> 8) & 0xff).toByte)
          .put(((c >> 16) & 0xff).toByte)      // BGR on disk
        x += 1
      }
      var pad = stride - width * 3
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      y -= 1
    }
    bb.array()
  }

  /** Deterministic pixel pattern for doc `id`: channel gradients plus an
    * id-keyed diagonal, seeded purely by (id, x, y) so reruns and partition
    * layouts agree.
    */
  def bmpPixel(id: Long)(x: Int, y: Int): Int = {
    val r = (x * 37 + id) % 256
    val g = (y * 53 + id * 7) % 256
    val b = (x + y + id * 13) % 256
    (r.toInt << 16) | (g.toInt << 8) | b.toInt
  }

  /** Synthesize a deterministic media table from `documents`. Audio rows get
    * a REAL WAV container and image rows a REAL BMP container (both decoded
    * for real downstream); video keeps the text bytes as an opaque stand-in
    * payload. Typed map instead of Column expressions — this is the
    * data-generation stand-in for a binaryFile scan, not a hot-path operator.
    * Image width/height metadata is the ACTUAL container geometry (small —
    * payloads are per-row synthetic, not storage-backed).
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
        kind match {
          case "audio" =>
            MediaRow(id, kind, wavBytes(sr, pcmSamples(id, (nChars % 480 + 48).toInt, sr)),
              (nChars % 640 + 64).toInt, (nChars % 480 + 48).toInt, sr)
          case "image" =>
            val w = (id % 24 + 8).toInt
            val h = (id % 16 + 8).toInt
            MediaRow(id, kind, bmpBytes(w, h, bmpPixel(id)), w, h, 0)
          case _ =>
            MediaRow(id, kind, text.getBytes("UTF-8"),
              (nChars % 640 + 64).toInt, (nChars % 480 + 48).toInt, 0)
        }
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

  /** Parsed BMP facts — everything below comes from actually reading the
    * container, not from row metadata.
    */
  final case class BmpInfo(
      width: Int, height: Int, meanR: Double, meanG: Double, meanB: Double,
      meanLuma: Double, lumaVar: Double)

  /** REAL BMP decode: validate the `BM` magic, read the pixel-data offset
    * from the file header and the geometry/bit-depth/compression fields from
    * the BITMAPINFOHEADER (offsets are read, not assumed — a v5 header with
    * a bigger info block still parses), then walk the bottom-up 4-byte-padded
    * BGR rows accumulating per-channel sums and luma moments (Rec.601
    * weights).
    */
  def decodeBmp(payload: Array[Byte]): BmpInfo = {
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.remaining() >= 54, "truncated BMP header")
    require(bb.get() == 'B'.toByte && bb.get() == 'M'.toByte, "not a BMP container")
    bb.getInt                       // file size
    bb.getInt                       // reserved
    val dataOffset = bb.getInt
    val infoSize = bb.getInt        // 40 for BITMAPINFOHEADER, larger for v4/v5
    require(infoSize >= 40, s"unsupported info header size $infoSize")
    val width = bb.getInt
    val height = bb.getInt
    require(width > 0 && height > 0, s"unsupported geometry ${width}x$height")
    require(bb.getShort == 1, "planes must be 1")
    val bpp = bb.getShort
    require(bpp == 24, s"only 24-bit BMP supported, got $bpp")
    require(bb.getInt == 0, "only uncompressed (BI_RGB) supported")
    val stride = (width * 3 + 3) / 4 * 4
    require(payload.length >= dataOffset + stride * height, "truncated pixel data")
    var sr = 0L; var sg = 0L; var sb = 0L
    var sl = 0.0; var sl2 = 0.0
    var y = 0
    while (y < height) {
      var base = dataOffset + (height - 1 - y) * stride // bottom-up storage
      var x = 0
      while (x < width) {
        val b = payload(base) & 0xff
        val g = payload(base + 1) & 0xff
        val r = payload(base + 2) & 0xff
        sr += r; sg += g; sb += b
        val luma = 0.299 * r + 0.587 * g + 0.114 * b
        sl += luma; sl2 += luma * luma
        base += 3
        x += 1
      }
      y += 1
    }
    val n = width.toLong * height
    val ml = sl / n
    BmpInfo(width, height, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n,
      ml, sl2 / n - ml * ml)
  }

  /** Image features from the REAL decode: [width, height, meanR/255,
    * meanG/255, meanB/255, meanLuma/255, luma stddev/255, aspect ratio],
    * zero-padded to `dim`.
    */
  def decodeBmpFeatures(row: MediaRow, dim: Int): MediaFeatures = {
    val b = decodeBmp(row.payload)
    val base = Array[Float](
      b.width.toFloat, b.height.toFloat,
      (b.meanR / 255.0).toFloat, (b.meanG / 255.0).toFloat, (b.meanB / 255.0).toFloat,
      (b.meanLuma / 255.0).toFloat,
      (math.sqrt(math.max(b.lumaVar, 0.0)) / 255.0).toFloat,
      b.width.toFloat / b.height)
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

  /** Per-row dispatch: audio and image decode for real, video falls back to
    * the stub until a codec is wired in.
    */
  def decodeOne(row: MediaRow, dim: Int): MediaFeatures = row.kind match {
    case "audio" => decodeWavFeatures(row, dim)
    case "image" => decodeBmpFeatures(row, dim)
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
