package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travels as an opaque `binary` payload plus typed metadata — the
  * schema, partitioning, and batch shape a 100 TB media pipeline needs.
  *
  * All three kinds decode FOR REAL — genuine chunk-walking container
  * parsers, no codec libraries needed:
  *  - AUDIO: RIFF/WAVE (16-bit PCM). [[decodeWav]] validates magics, reads
  *    the fmt block, and computes amplitude features from the PCM frames.
  *  - IMAGE: 24-bit uncompressed BMP. [[decodeBmp]] parses the
  *    BITMAPFILEHEADER/BITMAPINFOHEADER (magic, data offset, geometry, bit
  *    depth), then walks the bottom-up padded pixel rows for per-channel
  *    means and luma statistics.
  *  - VIDEO: AVI (RIFF). [[decodeAvi]] parses the MainAVIHeader + video
  *    stream header (exact fps rational), then iterates the `movi` DIB
  *    frames for per-frame luma and inter-frame motion, cross-checking the
  *    counted frames against the header.
  * Compressed codecs (JPEG/H.264/AAC) would slot in at the same seams (a
  * JNI codec, ONNX runtime, or subprocess inside the per-partition batch
  * loop); [[decodeStub]] remains the documented fallback for foreign kinds.
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

  /** Minimal but REAL AVI (RIFF) encoder: `LIST hdrl` with a MainAVIHeader
    * (`avih`) and one `vids`/`DIB ` stream (`strh` with the exact fps
    * rational + `strf` BITMAPINFOHEADER), followed by `LIST movi` holding
    * uncompressed 24-bit `00db` frames (bottom-up, 4-byte-padded rows — the
    * DIB layout). `rgb(f, x, y)` returns frame `f`'s pixel as `0xRRGGBB`.
    * The synthetic stand-in for real video files landed by
    * `spark.read.format("binaryFile")`.
    */
  def aviBytes(width: Int, height: Int, nFrames: Int, fpsRate: Int,
      fpsScale: Int, rgb: (Int, Int, Int) => Int): Array[Byte] = {
    val stride = (width * 3 + 3) / 4 * 4
    val frameLen = stride * height
    val moviPayload = 4 + nFrames * (8 + frameLen)
    val riffSize = 4 + (8 + 192) + (8 + moviPayload)
    val bb = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    cc("RIFF"); bb.putInt(riffSize); cc("AVI ")
    cc("LIST"); bb.putInt(192); cc("hdrl")
    cc("avih"); bb.putInt(56)
    bb.putInt((1000000L * fpsScale / fpsRate).toInt) // dwMicroSecPerFrame
      .putInt(frameLen * fpsRate / fpsScale)         // dwMaxBytesPerSec
      .putInt(0).putInt(0)                           // padding, flags
      .putInt(nFrames).putInt(0)                     // dwTotalFrames, initial
      .putInt(1).putInt(frameLen)                    // dwStreams, sug. buffer
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0)       // dwReserved[4]
    cc("LIST"); bb.putInt(116); cc("strl")
    cc("strh"); bb.putInt(56)
    cc("vids"); cc("DIB ")
    bb.putInt(0).putShort(0).putShort(0).putInt(0)   // flags, prio, lang, init
      .putInt(fpsScale).putInt(fpsRate)              // dwScale, dwRate
      .putInt(0).putInt(nFrames)                     // dwStart, dwLength
      .putInt(frameLen).putInt(-1).putInt(0)         // bufsize, quality, sampleSize
      .putShort(0).putShort(0)
      .putShort(width.toShort).putShort(height.toShort) // rcFrame
    cc("strf"); bb.putInt(40)
    bb.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(frameLen).putInt(0).putInt(0).putInt(0).putInt(0)
    cc("LIST"); bb.putInt(moviPayload); cc("movi")
    var f = 0
    while (f < nFrames) {
      cc("00db"); bb.putInt(frameLen)
      var y = height - 1                             // bottom-up row order
      while (y >= 0) {
        var x = 0
        while (x < width) {
          val c = rgb(f, x, y)
          bb.put((c & 0xff).toByte).put(((c >> 8) & 0xff).toByte)
            .put(((c >> 16) & 0xff).toByte)          // BGR on disk
          x += 1
        }
        var pad = stride - width * 3
        while (pad > 0) { bb.put(0.toByte); pad -= 1 }
        y -= 1
      }
      f += 1
    }
    bb.array()
  }

  /** Deterministic per-frame pixel pattern for doc `id`: the [[bmpPixel]]
    * gradients translated by the frame index, so consecutive frames differ
    * by a known shift (giving the motion feature real signal).
    */
  def aviPixel(id: Long)(f: Int, x: Int, y: Int): Int = bmpPixel(id)(x + 2 * f, y + f)

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
            val w = (id % 16 + 8).toInt
            val h = (id % 12 + 6).toInt
            val nf = (id % 5 + 2).toInt
            val fps = 24 + (id % 2).toInt * 6      // 24 or 30 fps
            MediaRow(id, kind, aviBytes(w, h, nf, fps, 1, aviPixel(id)), w, h, 0)
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

  /** REAL WAV decode returning the raw 16-bit PCM frames: the same RIFF
    * chunk walk as [[decodeWav]] (magic checks, size-skips, fmt-before-data
    * enforced) but materializing samples for window-level processing
    * ([[audioActivity]]). Payloads are per-row bounded (one clip), so the
    * array is a per-row working set, not driver state.
    */
  def wavSamples(payload: Array[Byte]): (Int, Array[Short]) = {
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    def fourCC(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(fourCC() == "RIFF", "not a RIFF container")
    bb.getInt
    require(fourCC() == "WAVE", "not a WAVE file")
    var sampleRate = 0
    var samples: Array[Short] = null
    while (samples == null && bb.remaining() >= 8) {
      val id = fourCC()
      val size = bb.getInt
      id match {
        case "fmt " =>
          val fmtEnd = bb.position() + size
          require(bb.getShort == 1, "not PCM")
          bb.getShort // channels
          sampleRate = bb.getInt
          bb.getInt   // byte rate
          bb.getShort // block align
          val bits = bb.getShort
          require(bits == 16, s"only 16-bit PCM supported, got $bits")
          bb.position(fmtEnd)
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt chunk")
          val n = size / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = bb.getShort; i += 1 }
          samples = out
        case _ =>
          bb.position(bb.position() + size + (size & 1))
      }
    }
    require(samples != null, "no data chunk found")
    (sampleRate, samples)
  }

  /** Per-clip energy segmentation facts from [[audioActivity]]. */
  final case class AudioSeg(
      media_id: Long, sample_rate: Long, n_windows: Long, n_active: Long,
      max_run: Long, peak_win_e: Long)

  /** Energy-based activity segmentation — the VAD-shaped pass a speech
    * pipeline runs before transcription to skip silence: each clip's PCM
    * frames are cut into fixed `win`-sample windows, each window's energy
    * is the EXACT integer sum of squared samples, and a window is active
    * when `energy · 1e6 ≥ thrPpm · peak-window-energy` (relative to the
    * clip's own loudest window, so quiet recordings don't go all-silent).
    * Output per clip: window count, active count, the LONGEST active run
    * (the largest speech segment, in windows), and the peak window energy.
    *
    * Same partition-batched decode shape as [[aHashes]]; all outputs are
    * exact integers. Rows-only like the rest of the mm family (binary
    * container decode has no ANSI mirror); the decode loop and the run
    * logic are pinned on synthesized clips in MultimodalSpec.
    */
  def audioActivity(media: DataFrame, win: Int = 64,
      thrPpm: Long = 250000L): Dataset[AudioSeg] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "audio").as[MediaRow]
      .repartition(spark.sparkContext.defaultParallelism, col("media_id"))
      .mapPartitions { it =>
        it.grouped(32).flatMap(_.map { r =>
          val (sr, s) = wavSamples(r.payload)
          val energies = s.grouped(win).map { w =>
            var e = 0L; var i = 0
            while (i < w.length) { e += w(i).toLong * w(i); i += 1 }
            e
          }.toArray
          val peak = if (energies.isEmpty) 0L else energies.max
          var active = 0L; var run = 0L; var maxRun = 0L
          energies.foreach { e =>
            if (e * 1000000L >= thrPpm * peak && peak > 0) {
              active += 1; run += 1; if (run > maxRun) maxRun = run
            } else run = 0
          }
          AudioSeg(r.media_id, sr.toLong, energies.length.toLong, active,
            maxRun, peak)
        })
      }
  }

  /** Energy-delta audio fingerprint census — the audio near-dup detector
    * (the shape of Chromaprint/Shazam-style landmark hashing, reduced to
    * the exact-integer signal this container carries): each clip's PCM is
    * cut into `win`-sample windows, each window's energy is the EXACT
    * integer sum of squared samples, and fingerprint bit `t−1` is set when
    * window `t`'s energy exceeds window `t−1`'s (first 64 deltas; the
    * generator's clip lengths give ≤32 windows at `win = 16`, so the code
    * fits a single long). Amplitude scales every window energy by the same
    * factor, so the fingerprint hears the tone's SHAPE, not its loudness —
    * same-frequency clips collide by design.
    *
    * Deliberately a CENSUS (`groupBy(fp)` → count + min id), never a pair
    * join: a dominant tone at web scale (hold music, silence, test tones)
    * costs one shuffled row per clip here, where a within-bucket pair join
    * would pay |bucket|² — the uncapped-`aHashPairs` lesson applied at
    * design time. Partial aggregation makes the shuffle |distinct fp| per
    * partition. All outputs are exact integers, hash-matched against the
    * closed-form PCM mirror ([[graft.OracleSql.mmAudioFingerprint]]).
    */
  def audioFingerprint(media: DataFrame, win: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "audio").as[MediaRow]
      .repartition(spark.sparkContext.defaultParallelism, col("media_id"))
      .mapPartitions { it =>
        it.grouped(32).flatMap(_.map(r => (r.media_id, audioFp(r.payload, win))))
      }.toDF("media_id", "fp")
      .groupBy("fp")
      .agg(count(lit(1)).as("n_clips"), min("media_id").as("min_id"))
  }

  /** The [[audioFingerprint]] per-clip kernel: real RIFF/PCM parse, exact
    * integer window energies, delta bits packed into one long — shared with
    * the streaming ingest twin so both planes fingerprint identically.
    */
  def audioFp(payload: Array[Byte], win: Int): Long = {
    val (_, s) = wavSamples(payload)
    val energies = s.grouped(win).map { w =>
      var e = 0L; var i = 0
      while (i < w.length) { e += w(i).toLong * w(i); i += 1 }
      e
    }.toArray
    var fp = 0L
    var t = 1
    while (t < energies.length && t <= 64) {
      if (energies(t) > energies(t - 1)) fp |= 1L << (t - 1)
      t += 1
    }
    fp
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

  /** Parsed AVI facts — everything below comes from actually reading the
    * container (header geometry cross-checked against the counted and
    * measured `movi` frames), not from row metadata.
    */
  final case class AviInfo(
      width: Int, height: Int, fpsRate: Int, fpsScale: Int, usPerFrame: Int,
      nFrames: Int, meanLuma: Double, motion: Double,
      frameMeanLumas: Array[Double] = Array.empty)

  /** REAL AVI decode: walk the RIFF lists (magic checks, chunk-size skips),
    * read the MainAVIHeader (`avih`: µs/frame, total frames, geometry) and
    * the video stream header (`strh`: the exact dwRate/dwScale fps
    * rational) + `strf` bit depth, then iterate the `movi` frame chunks
    * (`..db`/`..dc`) accumulating per-frame mean luma (Rec.601) and
    * inter-frame motion (mean |Δluma| per pixel between consecutive frames
    * — the real pixel-domain motion proxy). Frame count is required to
    * match the header's `dwTotalFrames`.
    */
  def decodeAvi(payload: Array[Byte]): AviInfo = {
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    def fourCC(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(fourCC() == "RIFF", "not a RIFF container")
    bb.getInt // riff size
    require(fourCC() == "AVI ", "not an AVI file")
    var width = 0; var height = 0; var usPerFrame = 0; var totalFrames = -1
    var fpsRate = 0; var fpsScale = 0
    var frames = 0
    var meanLumaSum = 0.0; var motionSum = 0.0; var motionFrames = 0
    var prev: Array[Double] = null
    val perFrame = scala.collection.mutable.ArrayBuffer.empty[Double]
    def walkHdrl(end: Int): Unit = {
      while (bb.position() < end) {
        val id = fourCC()
        val size = bb.getInt
        val next = bb.position() + size + (size & 1)
        id match {
          case "avih" =>
            usPerFrame = bb.getInt
            bb.getInt; bb.getInt; bb.getInt // maxbps, padding, flags
            totalFrames = bb.getInt
            bb.getInt; bb.getInt; bb.getInt // initial, streams, bufsize
            width = bb.getInt
            height = bb.getInt
          case "LIST" if fourCC() == "strl" =>
            // nested walk for strh/strf
            while (bb.position() < next) {
              val sid = fourCC()
              val ssize = bb.getInt
              val snext = bb.position() + ssize + (ssize & 1)
              sid match {
                case "strh" =>
                  val fccType = fourCC()
                  if (fccType == "vids") {
                    fourCC()                         // handler
                    bb.getInt; bb.getShort; bb.getShort; bb.getInt
                    fpsScale = bb.getInt
                    fpsRate = bb.getInt
                  }
                case "strf" =>
                  bb.getInt; bb.getInt; bb.getInt; bb.getShort // size, w, h, planes
                  val bpp = bb.getShort
                  require(bpp == 24, s"only 24-bit DIB frames supported, got $bpp")
                case _ => ()
              }
              bb.position(snext)
            }
          case _ => ()
        }
        bb.position(next)
      }
    }
    def walkMovi(end: Int): Unit = {
      val stride = (width * 3 + 3) / 4 * 4
      while (bb.position() < end) {
        val id = fourCC()
        val size = bb.getInt
        val next = bb.position() + size + (size & 1)
        if (id.endsWith("db") || id.endsWith("dc")) {
          require(size == stride * height, s"frame chunk $size != ${stride * height}")
          val base0 = bb.position()
          val lumas = new Array[Double](width * height)
          var y = 0
          while (y < height) {
            var base = base0 + (height - 1 - y) * stride // bottom-up storage
            var x = 0
            while (x < width) {
              val b = payload(base) & 0xff
              val g = payload(base + 1) & 0xff
              val r = payload(base + 2) & 0xff
              lumas(y * width + x) = 0.299 * r + 0.587 * g + 0.114 * b
              base += 3
              x += 1
            }
            y += 1
          }
          val frameMean = lumas.sum / lumas.length
          meanLumaSum += frameMean
          perFrame += frameMean
          if (prev != null) {
            var s = 0.0
            var i = 0
            while (i < lumas.length) { s += math.abs(lumas(i) - prev(i)); i += 1 }
            motionSum += s / lumas.length
            motionFrames += 1
          }
          prev = lumas
          frames += 1
        }
        bb.position(next)
      }
    }
    while (bb.remaining() >= 8) {
      val id = fourCC()
      val size = bb.getInt
      val next = bb.position() + size + (size & 1)
      if (id == "LIST") {
        val listType = fourCC()
        if (listType == "hdrl") walkHdrl(next)
        else if (listType == "movi") {
          require(width > 0 && height > 0, "movi before hdrl geometry")
          walkMovi(next)
        }
      }
      bb.position(next)
    }
    require(totalFrames >= 0, "no avih header found")
    require(frames == totalFrames,
      s"movi frame count $frames != header dwTotalFrames $totalFrames")
    AviInfo(width, height, fpsRate, fpsScale, usPerFrame, frames,
      if (frames > 0) meanLumaSum / frames else 0.0,
      if (motionFrames > 0) motionSum / motionFrames else 0.0,
      perFrame.toArray)
  }

  /** Video features from the REAL decode: [width, height, fps, n_frames,
    * duration_sec, meanLuma/255, motion/255, aspect ratio], zero-padded to
    * `dim`.
    */
  def decodeAviFeatures(row: MediaRow, dim: Int): MediaFeatures = {
    val v = decodeAvi(row.payload)
    val fps = if (v.fpsScale > 0) v.fpsRate.toFloat / v.fpsScale else 0.0f
    val base = Array[Float](
      v.width.toFloat, v.height.toFloat, fps, v.nFrames.toFloat,
      if (fps > 0) v.nFrames / fps else 0.0f,
      (v.meanLuma / 255.0).toFloat, (v.motion / 255.0).toFloat,
      v.width.toFloat / v.height)
    MediaFeatures(row.media_id, row.kind, row.payload.length.toLong,
      java.util.Arrays.copyOf(base, math.max(dim, base.length)))
  }

  /** STUB decoder for kinds without an in-container codec — a real
    * implementation would decode `payload` and run a feature extractor. The
    * fake is deterministic in the payload bytes so tests and reruns agree.
    * (All three shipped kinds decode for real now; this remains the
    * documented fallback for foreign kinds.)
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

  /** Per-row dispatch: all three shipped kinds decode their REAL container
    * (WAV, BMP, AVI); unknown kinds fall back to the stub.
    */
  def decodeOne(row: MediaRow, dim: Int): MediaFeatures = row.kind match {
    case "audio" => decodeWavFeatures(row, dim)
    case "image" => decodeBmpFeatures(row, dim)
    case "video" => decodeAviFeatures(row, dim)
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

  // ------------------------------------------------- resize / frame-sample

  final case class Thumb(media_id: Long, tw: Int, th: Int, thumb: Array[Float])
  final case class FrameSample(media_id: Long, n_frames: Int, lumas: Array[Float])

  /** REAL image resize: decode the BMP's pixel rows and box-filter the luma
    * plane down to a (tw × th) thumbnail — the fixed-budget preprocessing
    * step before any vision encoder. Source rectangles use exact integer
    * bounds (`ty·h/th … (ty+1)·h/th`), so the output is a pure function of
    * the container bytes; values are luma/255 in row-major order.
    */
  def resizeBmpLuma(payload: Array[Byte], tw: Int, th: Int): Array[Float] = {
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.remaining() >= 54, "truncated BMP header")
    require(bb.get() == 'B'.toByte && bb.get() == 'M'.toByte, "not a BMP container")
    bb.getInt; bb.getInt
    val dataOffset = bb.getInt
    require(bb.getInt >= 40, "unsupported info header size")
    val width = bb.getInt
    val height = bb.getInt
    require(width > 0 && height > 0, s"unsupported geometry ${width}x$height")
    require(bb.getShort == 1, "planes must be 1")
    require(bb.getShort == 24, "only 24-bit BMP supported")
    require(bb.getInt == 0, "only uncompressed (BI_RGB) supported")
    val stride = (width * 3 + 3) / 4 * 4
    require(payload.length >= dataOffset + stride * height, "truncated pixel data")
    resizeDibLuma(payload, dataOffset, width, height, stride, tw, th)
  }

  /** The shared box-filter core over a raw bottom-up 24-bit DIB pixel block
    * (the layout of both BMP pixel data and AVI `00db` frame chunks):
    * exact-integer source rectangles, luma/255 row-major output. Factored
    * so [[resizeBmpLuma]] and the per-frame video hashes run the IDENTICAL
    * loop — image and frame aHashes stay mutually comparable.
    */
  private def resizeDibLuma(payload: Array[Byte], dataOffset: Int,
      width: Int, height: Int, stride: Int, tw: Int, th: Int): Array[Float] = {
    require(tw >= 1 && th >= 1 && tw <= width && th <= height,
      s"target ${tw}x$th must fit inside ${width}x$height")
    val out = new Array[Float](tw * th)
    var ty = 0
    while (ty < th) {
      val y0 = ty * height / th; val y1 = (ty + 1) * height / th
      var tx = 0
      while (tx < tw) {
        val x0 = tx * width / tw; val x1 = (tx + 1) * width / tw
        var sum = 0.0
        var y = y0
        while (y < y1) {
          var base = dataOffset + (height - 1 - y) * stride + x0 * 3
          var x = x0
          while (x < x1) {
            val b = payload(base) & 0xff
            val g = payload(base + 1) & 0xff
            val r = payload(base + 2) & 0xff
            sum += 0.299 * r + 0.587 * g + 0.114 * b
            base += 3
            x += 1
          }
          y += 1
        }
        out(ty * tw + tx) = (sum / ((y1 - y0).toLong * (x1 - x0)) / 255.0).toFloat
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** Image thumbnails over the media table (kind = image only): the same
    * partition-batched decode shape as [[decodeFeatures]], emitting the
    * box-filtered (tw × th) luma grid per image.
    */
  def thumbnails(media: DataFrame, tw: Int = 4, th: Int = 4,
      batchSize: Int = 32): Dataset[Thumb] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image").as[MediaRow]
      .repartition(spark.sparkContext.defaultParallelism, col("media_id"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map(r =>
          Thumb(r.media_id, tw, th, resizeBmpLuma(r.payload, tw, th))))
      }
  }

  final case class PHash(media_id: Long, width: Int, height: Int, ahash: Long)

  /** Perceptual average-hash (aHash) of one image: box-filter the decoded
    * pixels to an 8×8 luma grid, set bit i when cell i exceeds the grid
    * mean. Crops, light noise, and re-encodes move few bits, so near-dup
    * frames land within a small hamming radius — the embedding-free image
    * dedup key.
    */
  def aHashOf(payload: Array[Byte]): Long = gridAHash(resizeBmpLuma(payload, 8, 8))

  /** aHash of a luma grid (≤ 64 cells): bit i set when cell i exceeds the
    * grid mean — shared by image ([[aHashOf]], always 8×8) and video-frame
    * ([[frameAHashesOf]], 8×8 clamped to the frame geometry) hashing so
    * same-geometry hashes are exactly comparable.
    */
  private def gridAHash(g: Array[Float]): Long = {
    val n = g.length
    require(n >= 1 && n <= 64, s"grid must have 1..64 cells, got $n")
    var sum = 0.0
    var i = 0
    while (i < n) { sum += g(i); i += 1 }
    val mean = sum / n
    var h = 0L
    i = 0
    while (i < n) { if (g(i) > mean) h |= 1L << i; i += 1 }
    h
  }

  /** Per-frame aHashes of an AVI payload: a light RIFF walk (hdrl geometry
    * + `movi` frame chunks — [[decodeAvi]] is the full validating decoder)
    * that box-filters each raw DIB frame to the 8×8 luma grid with the
    * EXACT loop images use and hashes it. One pass, no frame buffer kept.
    */
  def frameAHashesOf(payload: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    def fourCC(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(fourCC() == "RIFF", "not a RIFF container")
    bb.getInt
    require(fourCC() == "AVI ", "not an AVI file")
    var width = 0; var height = 0
    val hashes = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (bb.remaining() >= 8) {
      val id = fourCC()
      val size = bb.getInt
      val next = bb.position() + size + (size & 1)
      if (id == "LIST") {
        val listType = fourCC()
        if (listType == "hdrl") {
          while (bb.position() < next) {
            val hid = fourCC()
            val hsize = bb.getInt
            val hnext = bb.position() + hsize + (hsize & 1)
            if (hid == "avih") {
              bb.getInt; bb.getInt; bb.getInt; bb.getInt; bb.getInt
              bb.getInt; bb.getInt; bb.getInt
              width = bb.getInt
              height = bb.getInt
            }
            bb.position(hnext)
          }
        } else if (listType == "movi") {
          require(width > 0 && height > 0, "movi before hdrl geometry")
          val stride = (width * 3 + 3) / 4 * 4
          while (bb.position() < next) {
            val fid = fourCC()
            val fsize = bb.getInt
            val fnext = bb.position() + fsize + (fsize & 1)
            if (fid.endsWith("db") || fid.endsWith("dc")) {
              require(fsize == stride * height,
                s"frame chunk $fsize != ${stride * height}")
              // 8×8 clamped to the frame geometry (tiny fixture clips go
              // down to 6 rows); same-geometry frames stay exactly
              // comparable, which is all frame dedup compares
              hashes += gridAHash(resizeDibLuma(payload, bb.position(),
                width, height, stride, math.min(8, width), math.min(8, height)))
            }
            bb.position(fnext)
          }
        }
      }
      bb.position(next)
    }
    hashes.toArray
  }

  final case class FrameHash(media_id: Long, frame_ix: Long, ahash: Long)

  /** Per-frame aHashes over the media table (kind = video only), in the
    * same partition-batched decode shape as [[aHashes]]. Feed the result —
    * keyed by a composite (media_id, frame_ix) id — into [[aHashPairs]]'s
    * pigeonhole blocking for frame-level near-dup detection within and
    * across videos (re-encoded clips, shared intros, freeze frames).
    */
  def frameAHashes(media: DataFrame, batchSize: Int = 32): Dataset[FrameHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video").as[MediaRow]
      .repartition(spark.sparkContext.defaultParallelism, col("media_id"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.flatMap(r =>
          frameAHashesOf(r.payload).zipWithIndex.map { case (h, ix) =>
            FrameHash(r.media_id, ix.toLong, h)
          }))
      }
  }

  /** Per-image aHash over the media table (kind = image only), in the same
    * partition-batched decode shape as [[thumbnails]].
    */
  def aHashes(media: DataFrame, batchSize: Int = 32): Dataset[PHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image").as[MediaRow]
      .repartition(spark.sparkContext.defaultParallelism, col("media_id"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map(r =>
          PHash(r.media_id, r.width, r.height, aHashOf(r.payload))))
      }
  }

  /** Near-duplicate image pairs at hamming ≤ `maxHamming` over aHash —
    * the SimHash pigeonhole scaled to images: the 64 bits split into
    * maxHamming+1 chunks, so any qualifying pair shares at least one equal
    * chunk (≤ maxHamming differing bits cannot touch every chunk); blocked
    * self-equi-join on (chunk, value), then the exact popcount refine. The
    * only join is a hash join on the chunk key — no all-pairs anywhere, the
    * same candidate-generation shape at any corpus size.
    *
    * `maxBucketRows` (round 17 — the df-cap pattern of
    * `dedup_ngram_capped` at the pixel plane): a pathological chunk
    * bucket — near-black thumbnails, constant frames, any dominant visual
    * motif at web scale — contributes |bucket|² candidate rows. With the
    * cap set, buckets over it are dropped from candidate generation
    * entirely. RECALL TRADE, stated precisely: a qualifying pair is missed
    * only if EVERY chunk the two images share equally is hot — pairs
    * whose difference avoids at least one cool chunk still surface
    * through it. `mm_phash` publishes the capped form hash-exact as the
    * PRODUCTION default (the sf fixture's four hot buckets engage the
    * cap); `mm_phash_exact` keeps the exact uncapped contract as the
    * semantics/oracle reference (r17 verdict task 3 flipped the roles).
    */
  /** Production bucket cap for [[aHashPairs]] consumers (r17 verdict task:
    * the capped form IS the production default, mirroring the
    * live-vs-indexed pattern — uncapped stays the exact semantics/oracle
    * reference). 16 bounds any bucket's quadratic term at 256 candidate
    * pairs; a chunk value shared by MORE than 16 images/frames is a
    * constant-motif artifact (near-black thumbnails, freeze frames,
    * boilerplate intros) whose pairs identify the motif, not a re-encode.
    * MEASURED (SCALE.md r17): 8.7 s capped vs 334.6 s uncapped at 100×
    * images — the uncapped |bucket|² term is the mm family's scale-killer.
    * At fixture scale the cap engages only on the image fixture's four
    * hot buckets (recall trade oracle-verified 88→76 partners at sf0.01);
    * frame-hash buckets max out at 4 rows, so `mm_frame_dedup` results
    * are bit-identical capped or not (bucket census, DuckDB, r18).
    */
  val defaultMaxBucketRows: Int = 16

  def aHashPairs(hashes: DataFrame, maxHamming: Int = 3,
      maxBucketRows: Int = 0): DataFrame = {
    val nChunks = maxHamming + 1
    val bounds = (0 to nChunks).map(c => c * 64 / nChunks)
    val entries = array((0 until nChunks).map { c =>
      val width = bounds(c + 1) - bounds(c)
      val mask = if (width == 64) -1L else (1L << width) - 1
      struct(lit(c).as("chunk"),
        shiftrightunsigned(col("ahash"), bounds(c)).bitwiseAND(lit(mask)).as("v"))
    }: _*)
    val all = hashes
      .select(col("media_id"), col("ahash"), explode(entries).as("b"))
      .select(col("media_id"), col("ahash"),
        col("b.chunk").as("chunk"), col("b.v").as("v"))
    val blocked =
      if (maxBucketRows <= 0) all
      else {
        // bucket census + cap: one extra aggregation over the blocked
        // relation (4·n rows), the quadratic term bounded at cap²
        val sizes = all.groupBy("chunk", "v")
          .agg(count(lit(1)).as("bucket_n"))
        all.join(sizes, Seq("chunk", "v"))
          .filter(col("bucket_n") <= maxBucketRows)
          .select(col("media_id"), col("ahash"), col("chunk"), col("v"))
      }
    blocked.alias("x").join(blocked.alias("y"),
        col("x.chunk") === col("y.chunk") && col("x.v") === col("y.v") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("a_id"), col("y.media_id").as("b_id"),
        col("x.ahash").as("ha"), col("y.ahash").as("hb"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** Video frame sampling (kind = video only): decode the AVI and keep k
    * uniformly-spaced frames' mean lumas (indices `i·n/k`, the fixed-budget
    * frame-sample every video training pipeline runs so cost per clip is
    * O(k), not O(duration)). Clips shorter than k frames keep every frame.
    */
  def frameSamples(media: DataFrame, k: Int = 4,
      batchSize: Int = 32): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video").as[MediaRow]
      .repartition(spark.sparkContext.defaultParallelism, col("media_id"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { r =>
          val v = decodeAvi(r.payload)
          val idx =
            if (v.nFrames <= k) 0 until v.nFrames
            else (0 until k).map(i => i * v.nFrames / k)
          FrameSample(r.media_id, v.nFrames,
            idx.map(i => (v.frameMeanLumas(i) / 255.0).toFloat).toArray)
        })
      }
  }

  /** Shot-boundary / KEYFRAME census per video — the sampling rule video
    * training pipelines prefer over uniform spacing when clips have cuts:
    * frame f is a keyframe when its aHash hamming distance from frame f−1
    * is ≥ `minHamming` (frame 0 always keys — it opens the first shot).
    * The default threshold sits at the synthetic fixture's median
    * inter-frame delta (its generator pans every frame, so deltas cluster
    * ~29–40 bits; real footage clusters near 0 with spikes at cuts — tune
    * per corpus, which is exactly what the max_cut_hamming column is for).
    * Emits per video: frame count, keyframe count, and the strongest cut's
    * hamming distance (0 for single-shot clips under the threshold).
    *
    * Scale shape: the [[frameAHashes]] partition-batched decode (one AVI
    * walk per clip), then a lag window PARTITIONED BY media_id — frames
    * per clip are bounded by clip length, so no partition outgrows a
    * task regardless of corpus size — and one grouped rollup. Rows-only
    * like the rest of the mm family (binary decode has no ANSI mirror);
    * golden-pinned in MultimodalSpec.
    */
  def keyframes(media: DataFrame, minHamming: Int = 33,
      batchSize: Int = 32): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_ix")
    frameAHashes(media, batchSize).toDF()
      .withColumn("prev", lag("ahash", 1).over(w))
      .withColumn("dh",
        bit_count(col("ahash").bitwiseXOR(col("prev"))).cast("long"))
      .withColumn("is_key",
        (col("prev").isNull || col("dh") >= minHamming).cast("long"))
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"),
        sum("is_key").as("n_keyframes"),
        // strongest CUT, not strongest delta: sub-threshold deltas are not
        // cuts, so a single-shot clip reports 0 (the documented contract)
        coalesce(max(when(col("dh") >= minHamming, col("dh"))), lit(0L))
          .as("max_cut_hamming"))
  }
}
