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
    val joined = media
      .select(col("media_id"), col("kind"), length(col("payload")).as("len"))
      .join(Tables.read(spark, sf("0.001"), "documents"),
        col("media_id") === col("doc_id"))
    // video payloads are real AVI containers: 224 bytes of RIFF/hdrl/movi
    // framing + nFrames DIB frames of stride*height bytes each
    assert(media.filter(col("kind") === "video" &&
      length(col("payload")) =!= lit(224) +
        (col("media_id") % 5 + 2) *
          (lit(8) + expr("((width * 3 + 3) div 4) * 4") * col("height")))
      .count() == 0)
    // audio payloads are real WAV containers: 44-byte header + 2 bytes/sample
    assert(joined.filter(col("kind") === "audio" &&
      col("len") =!= lit(44) + (col("n_chars") % 480 + 48) * 2).count() == 0)
    // image payloads are real BMP containers: 54-byte header + padded rows,
    // and the metadata geometry is the actual container geometry
    assert(media.filter(col("kind") === "image" &&
      length(col("payload")) =!= lit(54) +
        expr("((width * 3 + 3) div 4) * 4") * col("height")).count() == 0)
  }

  test("BMP decode extracts exact geometry and channel stats") {
    // 2x2 image with known pixels: solid red, green, blue, white
    val px = Map((0, 0) -> 0xff0000, (1, 0) -> 0x00ff00,
      (0, 1) -> 0x0000ff, (1, 1) -> 0xffffff)
    val bmp = Multimodal.bmpBytes(2, 2, (x, y) => px((x, y)))
    val b = Multimodal.decodeBmp(bmp)
    assert(b.width == 2 && b.height == 2)
    assert(b.meanR == 255 / 2.0 && b.meanG == 255 / 2.0 && b.meanB == 255 / 2.0)
    val lumas = Seq(0.299 * 255, 0.587 * 255, 0.114 * 255, 255.0)
    val ml = lumas.sum / 4
    assert(math.abs(b.meanLuma - ml) < 1e-9)
    assert(math.abs(b.lumaVar - (lumas.map(l => l * l).sum / 4 - ml * ml)) < 1e-9)
    // row padding honored: odd width forces a 4-byte stride
    val b3 = Multimodal.decodeBmp(Multimodal.bmpBytes(3, 1, (_, _) => 0x010203))
    assert(b3.width == 3 && b3.meanR == 1.0 && b3.meanG == 2.0 && b3.meanB == 3.0)
    // malformed payloads fail loudly, not silently
    intercept[IllegalArgumentException] {
      Multimodal.decodeBmp("definitely not a bitmap".getBytes("UTF-8"))
    }
  }

  test("image rows decode for real: features come from the container") {
    val docs = Tables.read(spark, sf("0.001"), "documents")
    val media = Multimodal.mediaTable(docs)
    val images = Multimodal.decodeFeatures(media, dim = 8)
      .filter(_.kind == "image").collect()
    assert(images.nonEmpty)
    images.foreach { f =>
      assert(f.features(0) >= 8.0f && f.features(0) <= 31.0f, "width from header")
      assert(f.features(1) >= 8.0f && f.features(1) <= 23.0f, "height from header")
      assert(f.features(5) > 0.0f && f.features(5) < 1.0f, "mean luma from pixels")
    }
    // decode matches an offline re-encode of the same deterministic pattern
    val one = images.minBy(_.media_id)
    val (w, h) = (one.features(0).toInt, one.features(1).toInt)
    val expected = Multimodal.decodeBmp(
      Multimodal.bmpBytes(w, h, Multimodal.bmpPixel(one.media_id)))
    assert(one.features(2) == (expected.meanR / 255.0).toFloat)
    assert(one.features(6) == (math.sqrt(expected.lumaVar) / 255.0).toFloat)
  }

  test("WAV decode extracts exact header facts and amplitude stats") {
    // hand-built container with known samples: peak 32767, 2 sign flips
    val samples = Array[Short](0, 1000, -2000, 32767, 0, -1)
    val wav = Multimodal.wavBytes(8000, samples)
    val w = Multimodal.decodeWav(wav)
    assert(w.sampleRate == 8000)
    assert(w.nSamples == 6)
    assert(w.peak == 32767)
    assert(w.zeroCrossings == 3) // 1000→-2000, -2000→32767, 32767→-1 (zeros skipped)
    val expRms = math.sqrt(samples.map(s => s.toDouble * s).sum / samples.length)
    assert(math.abs(w.rms - expRms) < 1e-9)
    // malformed payloads fail loudly, not silently
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav("not a wav at all".getBytes("UTF-8"))
    }
  }

  test("audioActivity: silence-burst-silence yields one run; exact window energies") {
    import spark.implicits._
    // 4-sample windows: [silence][burst][burst][silence][tail-burst]
    val s = Array[Short](
      0, 0, 0, 0,                 // w0: e=0           inactive
      1000, 1000, 1000, 1000,     // w1: e=4e6         active
      2000, 2000, 2000, 2000,     // w2: e=16e6 (peak) active
      0, 0, 1, 0,                 // w3: e=1           inactive (1e6 < thr*16e6)
      1000, 1000)                 // w4 (short): e=2e6 active at thr=0.1
    val rows = Seq(Multimodal.MediaRow(7L, "audio",
      Multimodal.wavBytes(8000, s), 0, 0, 8000)).toDF()
    val got = Multimodal.audioActivity(rows, win = 4, thrPpm = 100000L)
      .collect().head
    assert(got == Multimodal.AudioSeg(7L, 8000L, 5L, 3L, 2L, 16000000L))
    // samples round-trip exactly through the dedicated parser
    val (sr, back) = Multimodal.wavSamples(Multimodal.wavBytes(8000, s))
    assert(sr == 8000 && back.toSeq == s.toSeq)
    // all-silence clip: peak 0 -> zero active windows, zero runs
    val quiet = Seq(Multimodal.MediaRow(8L, "audio",
      Multimodal.wavBytes(8000, Array[Short](0, 0, 0, 0, 0)), 0, 0, 8000)).toDF()
    val q = Multimodal.audioActivity(quiet, win = 4).collect().head
    assert(q.n_active == 0L && q.max_run == 0L && q.peak_win_e == 0L)
  }

  test("audioFingerprint: exact delta bits on a crafted clip; census covers " +
    "every clip once; amplitude-invariant by construction") {
    import spark.implicits._
    // 4-sample windows with energies 0, 4e6, 16e6, 1, 2e6:
    // deltas up>, up>, down, up -> bits 1,1,0,1 -> fp = 0b1011 = 11
    val s = Array[Short](
      0, 0, 0, 0, 1000, 1000, 1000, 1000, 2000, 2000, 2000, 2000,
      0, 0, 1, 0, 1000, 1000)
    // the same shape at half amplitude fingerprints identically
    val half = s.map(x => (x / 2).toShort)
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", Multimodal.wavBytes(8000, s), 0, 0, 8000),
      Multimodal.MediaRow(2L, "audio", Multimodal.wavBytes(8000, half), 0, 0, 8000))
      .toDF()
    val got = Multimodal.audioFingerprint(rows, win = 4).collect()
    assert(got.length == 1, "amplitude-scaled twin must collide")
    assert(got.head.getLong(0) == 11L && got.head.getLong(1) == 2L &&
      got.head.getLong(2) == 1L)
    // real corpus: the census partitions the audio clips exactly
    val media = Multimodal.mediaTable(Tables.read(spark, sf("0.001"), "documents"))
    val census = Multimodal.audioFingerprint(media).collect()
    val nAudio = media.filter($"kind" === "audio").count()
    assert(census.map(_.getLong(1)).sum == nAudio)
    assert(census.length > 1, "distinct tone shapes must separate")
    assert(census.exists(_.getLong(1) > 1L), "same-tone clips must collide")
  }

  test("audio rows decode for real: features come from the container, not metadata") {
    val docs = Tables.read(spark, sf("0.001"), "documents")
    val media = Multimodal.mediaTable(docs)
    val audio = Multimodal.decodeFeatures(media, dim = 8)
      .filter(_.kind == "audio").collect()
    assert(audio.nonEmpty)
    audio.foreach { f =>
      assert(f.features(0) == 16000.0f, "f0 must be the parsed sample rate")
      assert(f.features(1) >= 48.0f && f.features(1) <= 527.0f, "n_samples from data chunk")
      assert(f.features(2) > 0.0f && f.features(2) <= 1.0f, "peak must be real amplitude")
      assert(f.features(4) > 0.0f, "a sine wave has zero crossings")
      // n_bytes is the container size, consistent with the parsed sample count
      assert(f.n_bytes == 44 + 2 * f.features(1).toLong)
    }
    // the tone generator is seeded per doc: decode matches an offline encode
    val one = audio.minBy(_.media_id)
    val expected = Multimodal.decodeWav(
      Multimodal.wavBytes(16000, Multimodal.pcmSamples(one.media_id, one.features(1).toInt, 16000)))
    assert(one.features(2) == expected.peak / 32767.0f)
  }

  test("AVI decode extracts header geometry, exact fps rational, and frame stats") {
    // 2 frames of 4x2: frame 0 all black, frame 1 all white -> meanLuma 127.5,
    // motion (mean |delta luma| between consecutive frames) = 255
    val avi = Multimodal.aviBytes(4, 2, 2, 30, 1,
      (f, _, _) => if (f == 0) 0x000000 else 0xffffff)
    val v = Multimodal.decodeAvi(avi)
    assert(v.width == 4 && v.height == 2)
    assert(v.fpsRate == 30 && v.fpsScale == 1 && v.usPerFrame == 33333)
    assert(v.nFrames == 2)
    assert(math.abs(v.meanLuma - 127.5) < 1e-9 && math.abs(v.motion - 255.0) < 1e-9)

    // a corrupted header frame count must be rejected (the parser
    // cross-checks movi against dwTotalFrames)
    val bad = avi.clone()
    bad(0x20 + 0x10) = 9 // dwTotalFrames lives at hdrl payload offset: RIFF(12)+LIST hdr(8)+avih hdr(8) + 16
    intercept[IllegalArgumentException](Multimodal.decodeAvi(bad))

    // features: derived from the container, zero-padded to dim
    val row = Multimodal.MediaRow(7L, "video", avi, 0, 0, 0)
    val f = Multimodal.decodeAviFeatures(row, 10).features
    assert(f.toSeq.take(8) == Seq(4.0f, 2.0f, 30.0f, 2.0f, 2.0f / 30, 0.5f, 1.0f, 2.0f))
    assert(f.length == 10 && f(8) == 0.0f && f(9) == 0.0f)
  }

  test("mediaTable video rows decode with container-derived values") {
    // the verdict item: assert container-DERIVED values for kind=video —
    // geometry/fps/frame count come out of the parsed AVI, matching what
    // mediaTable encoded from the row key
    val media = Multimodal.mediaTable(Tables.read(spark, sf("0.001"), "documents"))
    val vids = media.filter(col("kind") === "video")
      .select("media_id", "payload", "width", "height")
      .collect()
    assert(vids.nonEmpty)
    vids.foreach { r =>
      val id = r.getLong(0)
      val v = Multimodal.decodeAvi(r.getAs[Array[Byte]](1))
      assert(v.width == r.getInt(2) && v.height == r.getInt(3))
      assert(v.nFrames == (id % 5 + 2).toInt)
      assert(v.fpsRate == 24 + (id % 2).toInt * 6 && v.fpsScale == 1)
      assert(v.motion > 0.0) // the translated gradient really moves
    }
  }

  test("binaryFile is the real landing path: files on disk decode end-to-end") {
    // the production ingress the scaladoc claims: media FILES land via
    // spark.read.format("binaryFile"), kind from the extension, payload from
    // the content column — then the same decoders run
    import java.nio.file.{Files, Paths}
    val dir = Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_media_land")
    Files.createDirectories(dir)
    Files.write(dir.resolve("a.wav"),
      Multimodal.wavBytes(8000, Multimodal.pcmSamples(3L, 100, 8000)))
    Files.write(dir.resolve("b.bmp"), Multimodal.bmpBytes(5, 4, Multimodal.bmpPixel(9L)))
    Files.write(dir.resolve("c.avi"),
      Multimodal.aviBytes(6, 4, 3, 25, 1, Multimodal.aviPixel(2L)))
    val landed = spark.read.format("binaryFile").load(dir.toString + "/*")
      .select(col("path"), col("content"))
      .collect().map { r =>
        val ext = r.getString(0).reverse.takeWhile(_ != '.').reverse
        val kind = Map("wav" -> "audio", "bmp" -> "image", "avi" -> "video")(ext)
        Multimodal.MediaRow(ext.hashCode.toLong, kind, r.getAs[Array[Byte]](1), 0, 0, 0)
      }
    val byKind = landed.map(m => m.kind -> Multimodal.decodeOne(m, 8)).toMap
    assert(byKind("audio").features(0) == 8000.0f)            // parsed sample rate
    assert(byKind("audio").features(1) == 100.0f)             // parsed sample count
    assert(byKind("image").features(0) == 5.0f &&
      byKind("image").features(1) == 4.0f)                    // parsed geometry
    assert(byKind("video").features(2) == 25.0f &&
      byKind("video").features(3) == 3.0f)                    // parsed fps + frames
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

  test("resizeBmpLuma box-filters to exact integer-rectangle means") {
    // 4x2 image, luma = r=g=b value per pixel: left half 40, right half 200
    val bmp = Multimodal.bmpBytes(4, 2,
      (x, _) => if (x < 2) 0x282828 else 0xC8C8C8)
    val t = Multimodal.resizeBmpLuma(bmp, 2, 1)
    assert(t.length == 2)
    assert(math.abs(t(0) - 40.0f / 255) < 1e-6 &&
      math.abs(t(1) - 200.0f / 255) < 1e-6)
    // full-size resize is the identity on the luma plane
    val id = Multimodal.resizeBmpLuma(bmp, 4, 2)
    assert(id.length == 8 && math.abs(id(0) - 40.0f / 255) < 1e-6 &&
      math.abs(id(3) - 200.0f / 255) < 1e-6)
    intercept[IllegalArgumentException](Multimodal.resizeBmpLuma(bmp, 8, 2))
  }

  test("frameSamples keeps k uniformly-spaced frames' mean lumas") {
    // 6 frames, frame f has constant luma 10f
    val avi = Multimodal.aviBytes(4, 2, nFrames = 6, fpsRate = 25, fpsScale = 1,
      (f, _, _) => (f * 10) * 0x010101)
    val v = Multimodal.decodeAvi(avi)
    assert(v.frameMeanLumas.toSeq == (0 until 6).map(_ * 10.0))
    import spark.implicits._
    val media = Seq((7L, "video", avi, 4, 2, 0))
      .toDF("media_id", "kind", "payload", "width", "height", "sample_rate")
    val fs = Multimodal.frameSamples(media, k = 3).collect().head
    assert(fs.n_frames == 6)
    // indices 0, 2, 4 → lumas 0, 20, 40 (each /255)
    assert(fs.lumas.length == 3)
    fs.lumas.zip(Seq(0.0f, 20.0f / 255, 40.0f / 255)).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-6, s"got ${fs.lumas.toSeq}") }
    // image thumbnails flow through the same batched pipeline
    val bmp = Multimodal.bmpBytes(4, 2, (x, _) => if (x < 2) 0x282828 else 0xC8C8C8)
    val imedia = Seq((8L, "image", bmp, 4, 2, 0))
      .toDF("media_id", "kind", "payload", "width", "height", "sample_rate")
    val th = Multimodal.thumbnails(imedia, tw = 2, th = 1).collect().head
    th.thumb.zip(Seq(40.0f / 255, 200.0f / 255)).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-6, s"got ${th.thumb.toSeq}") }
  }

  test("mm_thumbs pinned bytes: every thumbnail equals an offline re-encode") {
    // the thumbnail is a pure function of the container bytes, so the Spark
    // pipeline output must be BIT-exact (Float ==, no tolerance) against an
    // offline rebuild of the same deterministic BMP — the mm_phash
    // pigeonhole pin's sibling for the resize path
    val docs = Tables.read(spark, sf("0.001"), "documents")
    val media = Multimodal.mediaTable(docs)
    val thumbs = Multimodal.thumbnails(media).collect()
    val geo = media.filter(col("kind") === "image")
      .select("media_id", "width", "height").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(thumbs.nonEmpty && thumbs.map(_.media_id).toSet == geo.keySet,
      "one thumbnail per image row, none dropped")
    thumbs.foreach { t =>
      val (w, h) = geo(t.media_id)
      val expected = Multimodal.resizeBmpLuma(
        Multimodal.bmpBytes(w, h, Multimodal.bmpPixel(t.media_id)), t.tw, t.th)
      assert(t.thumb.toSeq == expected.toSeq,
        s"media ${t.media_id}: thumbnail bytes drifted from the container")
    }
  }

  test("frame aHashes pair a byte-identical clip frame-for-frame") {
    import spark.implicits._
    // two byte-identical clips (a re-encode under a new id) + one different
    val pat = (f: Int, x: Int, y: Int) =>
      (((x * 37 + y * 11 + f * 53) % 200 + 20) * 0x010101)
    val other = (f: Int, x: Int, y: Int) =>
      (((x * 13 + y * 29 + f * 7) % 200 + 20) * 0x010101)
    val avi = Multimodal.aviBytes(9, 8, nFrames = 4, fpsRate = 25, fpsScale = 1, pat)
    val avi2 = Multimodal.aviBytes(9, 8, nFrames = 4, fpsRate = 25, fpsScale = 1, other)
    val media = Seq((1L, "video", avi, 9, 8, 0), (2L, "video", avi, 9, 8, 0),
        (3L, "video", avi2, 9, 8, 0))
      .toDF("media_id", "kind", "payload", "width", "height", "sample_rate")
    val fh = Multimodal.frameAHashes(media).collect()
    assert(fh.length == 12, "4 frames per clip, none dropped")
    def hashes(id: Long): Seq[Long] =
      fh.filter(_.media_id == id).sortBy(_.frame_ix).map(_.ahash).toSeq
    assert(hashes(1L) == hashes(2L), "identical clips hash frame-for-frame")
    assert(hashes(1L) != hashes(3L), "different content must differ somewhere")
    // the raw per-frame hash agrees with hashing the same DIB wrapped as BMP
    // (shared resize loop + shared gridAHash) — frame 0 of clip 1:
    val bmp = Multimodal.bmpBytes(9, 8, (x, y) => pat(0, x, y))
    assert(Multimodal.frameAHashesOf(avi).head == Multimodal.aHashOf(bmp),
      "frame and image hashers must stay mutually comparable")
    // a sub-8-row clip still hashes (grid clamps to the frame geometry)
    val tiny = Multimodal.aviBytes(8, 6, nFrames = 2, fpsRate = 25, fpsScale = 1, pat)
    assert(Multimodal.frameAHashesOf(tiny).length == 2)
  }

  test("feature stats roll decoded media back up per kind") {
    val media = Multimodal.mediaTable(Tables.read(spark, sf("0.001"), "documents"))
    val stats = Multimodal.featureStats(Multimodal.decodeFeatures(media))
    val kinds = stats.select("kind").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("aHash: identical pixels hash equal; a light touch moves few bits") {
    import java.lang.Long.bitCount
    def checker(id: Long)(x: Int, y: Int): Int =
      if ((x + y) % 2 == 0) 0xffffff else 0x000000
    val a = Multimodal.aHashOf(Multimodal.bmpBytes(16, 16, checker(0)))
    val b = Multimodal.aHashOf(Multimodal.bmpBytes(16, 16, checker(1)))
    assert(a == b)                                  // same pixels, same hash
    // perturb one 2x2 block: at most one of the 64 grid cells flips
    val c = Multimodal.aHashOf(Multimodal.bmpBytes(16, 16, (x, y) =>
      if (x < 2 && y < 2) 0x808080 else checker(0)(x, y)))
    assert(bitCount(a ^ c) <= 2)
    // a structurally different image is far away
    val d = Multimodal.aHashOf(Multimodal.bmpBytes(16, 16, (x, y) =>
      if (x < 8) 0xffffff else 0x000000))
    assert(bitCount(a ^ d) > 3)
  }

  test("aHashPairs: pigeonhole blocking finds EVERY pair within the radius") {
    import spark.implicits._
    // adversarial bit spreads: differences land in 1, 2, and 3 distinct
    // 16-bit chunks — the pigeonhole guarantees a shared chunk survives
    val base = 0x0123456789abcdefL
    val rows = Seq(
      1L -> base,
      2L -> (base ^ 1L),                            // hamming 1, chunk 0
      3L -> (base ^ (1L << 17) ^ (1L << 33)),       // hamming 2, chunks 1+2
      4L -> (base ^ (1L << 1) ^ (1L << 18) ^ (1L << 50)), // hamming 3, 3 chunks
      5L -> (base ^ (1L << 2) ^ (1L << 19) ^ (1L << 34) ^ (1L << 51)) // 4 — out
    ).toDF("media_id", "ahash")
    val got = Multimodal.aHashPairs(rows, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(Set((1L, 2L, 1L), (1L, 3L, 2L), (1L, 4L, 3L)).subsetOf(got))
    assert(!got.exists(p => p._1 == 1L && p._2 == 5L)) // hamming 4 excluded
  }

  test("aHashPairs df-cap: capped pairs are a subset; a hot bucket's " +
      "exclusive pairs drop, cool-chunk pairs survive") {
    import spark.implicits._
    // every hash shares chunk 0 (value 0 — a 40-row bucket, hot at cap 8);
    // ids 1/2 also share the COOL chunk 1 (value 5, bucket of 2) and
    // differ by 1 bit in chunk 2 → their pair must SURVIVE the cap;
    // ids 3/4 differ by exactly 1 bit in EACH of chunks 1-3 (hamming 3,
    // no shared cool chunk) → their pair exists uncapped via the hot
    // chunk only and must DROP
    def mk(c1: Long, c2: Long, c3: Long): Long =
      (c3 << 48) | (c2 << 32) | (c1 << 16)
    val rows = (Seq(
      1L -> mk(5, 0x10, 0x20),
      2L -> mk(5, 0x11, 0x20),
      3L -> mk(0x30, 0x40, 0x50),
      4L -> mk(0x31, 0x41, 0x51)
    ) ++ (5L to 40L).map(i =>
      i -> mk(0x100 + i * 4, 0x1000 + i * 4, 0x2000 + i * 4)))
      .toDF("media_id", "ahash")
    val uncapped = Multimodal.aHashPairs(rows, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    val capped = Multimodal.aHashPairs(rows, maxHamming = 3,
        maxBucketRows = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(capped.subsetOf(uncapped), "cap may only remove pairs")
    assert(capped.contains((1L, 2L, 1L)),
      "pair sharing a cool chunk must survive the hot-bucket drop")
    assert(uncapped.contains((3L, 4L, 3L)) && !capped.contains((3L, 4L, 3L)),
      "pair whose only shared chunk is hot must drop")
  }

  test("aHash pipeline: planted duplicate images pair; distinct ones don't") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "image",
        Multimodal.bmpBytes(16, 16, Multimodal.bmpPixel(7)), 16, 16, 0),
      Multimodal.MediaRow(2L, "image",                   // byte-identical copy
        Multimodal.bmpBytes(16, 16, Multimodal.bmpPixel(7)), 16, 16, 0),
      Multimodal.MediaRow(3L, "image",                   // different content
        Multimodal.bmpBytes(16, 16, (x, y) => if (x < 8) 0xffffff else 0),
        16, 16, 0)).toDS().toDF()
    val pairs = Multimodal.aHashPairs(Multimodal.aHashes(rows).toDF())
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L, 0L)))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("mm_audio_seg: golden-value pin on the sf0.001 fixture") {
    // direct by-name pin of the no_oracle driver query: exact row census +
    // exact per-clip rows (the WAV decode + window energies are pure
    // functions of the deterministic generator, so these values are stable)
    val got = SparkEntry.queries("mm_audio_seg")(spark, sf("0.001"))
    val agg = got.agg(count(lit(1)), sum("n_windows"), sum("n_active"),
      sum("max_run"), sum("peak_win_e")).head()
    assert(agg.getLong(0) == 167L)
    assert(agg.getLong(1) == 798L)
    assert(agg.getLong(2) == 755L)
    assert(agg.getLong(3) == 755L)
    assert(agg.getLong(4) == 1734754276492L)
    val byId = got.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(byId(1L) == ((16000L, 8L, 8L, 8L, 3865408741L)))
    assert(byId(16L) == ((16000L, 1L, 1L, 1L, 5287449987L)))
    assert(byId(28L) == ((16000L, 9L, 8L, 8L, 2060175866L)))
  }

  test("mm_frame_dedup: golden-value pin on the sf0.001 fixture") {
    // by-name pin: exact pair census, and EVERY planted re-encode (the
    // +1000000 id-shifted byte-identical copy of each id%5==1 video) must
    // match its source on ALL nf = id%5+2 = 3 frames — 33 such videos at
    // sf0.001 (doc ids ≡ 11 mod 15 below 500)
    val got = SparkEntry.queries("mm_frame_dedup")(spark, sf("0.001"))
    val agg = got.agg(count(lit(1)), sum("n_frames")).head()
    assert(agg.getLong(0) == 210L)
    assert(agg.getLong(1) == 409L)
    val planted = got.filter(col("b_vid") >= 1000000L &&
      col("b_vid") - 1000000L === col("a_vid"))
    val pagg = planted.agg(count(lit(1)), sum("n_frames"),
      min("n_frames"), max("n_frames")).head()
    assert(pagg.getLong(0) == 33L)
    assert(pagg.getLong(1) == 99L)
    assert(pagg.getLong(2) == 3L && pagg.getLong(3) == 3L)
  }

  test("mm_binaryfile_ingest: file-ingest census equals mm_features and " +
      "prunes content from the scan") {
    // the ingest seam must reproduce the in-memory byte census exactly —
    // same rows through encode → file write → binaryFile scan — and the
    // scan must NOT read payload bytes (length is file-status metadata;
    // column pruning keeps `content` out of the read schema)
    val df = SparkEntry.queries("mm_binaryfile_ingest")(spark, sf("0.001"))
    val viaFiles = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val inMemory = SparkEntry.queries("mm_features")(spark, sf("0.001"))
      .select("kind", "n", "total_bytes").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(viaFiles.size == 3 && viaFiles == inMemory)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("content"),
      "binaryFile scan failed to prune the content column")
  }

  test("mm_keyframes: golden-value pin on the sf0.001 fixture") {
    // by-name pin: every video keys at least frame 0, never more frames
    // than it has, and the census splits (the threshold sits mid-
    // distribution, so neither all-frames nor first-frame-only)
    val got = SparkEntry.queries("mm_keyframes")(spark, sf("0.001"))
    val agg = got.agg(count(lit(1)), sum("n_frames"), sum("n_keyframes"),
      min("n_keyframes"), max("n_keyframes"), sum("max_cut_hamming")).head()
    assert(agg.getLong(0) == 166L, s"videos ${agg.getLong(0)}")
    assert(agg.getLong(1) == 664L, s"frames ${agg.getLong(1)}")
    assert(agg.getLong(2) == 317L, s"keyframes ${agg.getLong(2)}")
    assert(agg.getLong(3) == 1L && agg.getLong(4) == 4L)
    assert(agg.getLong(5) == 3788L, s"cut mass ${agg.getLong(5)}")
    // structural invariants at any threshold: every clip keys frame 0,
    // never more keys than frames, and a clip with no cut past the
    // threshold reports max_cut_hamming = 0 (58 such clips here)
    val bad = got.filter(col("n_keyframes") < 1L ||
      col("n_keyframes") > col("n_frames")).count()
    assert(bad == 0L)
    assert(got.filter(col("max_cut_hamming") === 0L).count() == 58L)
    val incoherent = got.filter(
      (col("max_cut_hamming") === 0L) =!= (col("n_keyframes") === 1L)).count()
    assert(incoherent == 0L, "no-cut must coincide with only frame 0 keying")
  }
}
