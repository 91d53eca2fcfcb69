package graft.operators

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("dHash is invariant to brightness shift and 2x scaling, sensitive to content") {
    val base = Multimodal.dhash64(
      Multimodal.syntheticGradientPng(18, 16, a = 4, b = 2, c = 17, shift = 0))
    // +8 brightness: every pixel differs, every luma DIFFERENCE same
    val brighter = Multimodal.dhash64(
      Multimodal.syntheticGradientPng(18, 16, a = 4, b = 2, c = 17, shift = 8))
    assert(brighter == base)
    // 2x-scaled rendering of the same gradient field: sample positions
    // double (px = 4x at 36 wide), halved slopes land on identical luma
    val scaled = Multimodal.dhash64(
      Multimodal.syntheticGradientPng(36, 32, a = 2, b = 1, c = 17, shift = 0))
    assert(scaled == base)
    // different content hashes differently
    val other = Multimodal.dhash64(
      Multimodal.syntheticGradientPng(18, 16, a = 5, b = 3, c = 90, shift = 0))
    assert(other != base)
    // pairs: the brightness twin is a hamming-0 near-dup of base
    val media = Seq(
      (1L, Multimodal.syntheticGradientPng(18, 16, 4, 2, 17, 0), "image/png"),
      (2L, Multimodal.syntheticGradientPng(18, 16, 4, 2, 17, 8), "image/png"),
      (3L, Multimodal.syntheticGradientPng(18, 16, 5, 3, 90, 0), "image/png"))
      .toDF("doc_id", "payload", "mime")
    val pairs = Dedup.hamming64NearDups(
      Multimodal.imageDHash(spark, media), maxHamming = 0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("audio fingerprint is volume-invariant, sensitive to the energy profile") {
    val amps = (0 until 65).map(i => 1000 + (i * 137) % 9000)
    val base = Multimodal.audioDHash64(Multimodal.syntheticWavSteps(amps))
    // 2x volume: every sample differs, every energy comparison the same
    val louder = Multimodal.audioDHash64(
      Multimodal.syntheticWavSteps(amps.map(_ * 2)))
    assert(louder == base)
    // different profile fingerprints differently
    val other = Multimodal.audioDHash64(
      Multimodal.syntheticWavSteps((0 until 65).map(i => 1000 + (i * 211) % 9000)))
    assert(other != base)
    // pairs: the louder twin is a hamming-0 near-dup
    val media = Seq(
      (1L, Multimodal.syntheticWavSteps(amps), "audio/wav"),
      (2L, Multimodal.syntheticWavSteps(amps.map(_ * 2)), "audio/wav"),
      (3L, Multimodal.syntheticWavSteps(
        (0 until 65).map(i => 1000 + (i * 211) % 9000)), "audio/wav"))
      .toDF("doc_id", "payload", "mime")
    val pairs = Dedup.hamming64NearDups(
      Multimodal.audioDHash(spark, media), maxHamming = 0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("video near-dup by frame-hash overlap: reorders/trims/brightness survive, distinct content does not") {
    def frame(seed: Long, shift: Int) = Multimodal.syntheticGradientPng(
      18, 16, (1 + seed % 13).toInt, (1 + (seed * 3) % 11).toInt,
      ((seed * 11) % 128).toInt, shift)
    def avi(seeds: Seq[Long], shift: Int) =
      Multimodal.syntheticAvi(seeds.map(frame(_, shift)), 18, 16)
    val media = Seq(
      (1L, avi(Seq(1, 2, 3, 4, 5, 6, 7, 8), 0), "video/avi"),
      (2L, avi(Seq(8, 7, 6, 5, 4, 3, 2, 1), 8), "video/avi"), // reordered + brighter
      (3L, avi(Seq(3, 4, 5, 6), 0), "video/avi"), // trimmed middle
      (4L, avi(Seq(100, 101, 102, 103, 104, 105, 106, 107), 0), "video/avi"))
      .toDF("doc_id", "payload", "mime")
    val out = Multimodal.videoNearDups(
      Multimodal.videoDHashes(spark, media), minOverlapPerMille = 900,
      maxDocsPerHash = None)
      .select("doc_a", "doc_b", "overlap_permille")
      .as[(Long, Long, Long)].collect().toSet
    // 1~2 share all hashes (order/brightness invariant); 3 is fully
    // contained in 1 and 2; 4 shares nothing
    assert(out == Set((1L, 2L, 1000L), (1L, 3L, 1000L), (2L, 3L, 1000L)))
  }

  test("metadata over binary payloads is deterministic and exact") {
    val docs = Seq((1L, "a" * 300), (2L, "xy")).toDF("doc_id", "text")
    val out = Multimodal.metadata(
      Multimodal.asMedia(docs, col("doc_id"), col("text"), "text/plain"))
      .select("doc_id", "n_bytes", "chunk_count")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 300L, 2L), (2L, 2L, 1L)))
  }

  test("resize caps the longest side, frame sampling strides frames") {
    val docs = Seq((1L, "x" * 1000), (2L, "y" * 100)).toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs, col("doc_id"), col("text"), "video/fake")
    val feats = Multimodal.decodeFeatures(spark, media)
    val resized = Multimodal.resize(spark, feats, maxSide = 32).collect()
    assert(resized.forall(f => math.max(f.width, f.height) <= 32))
    assert(resized.forall(f => f.width >= 1 && f.height >= 1))
    val frames = Multimodal.frameSample(spark, media, everyNth = 3).collect()
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc(1L).length == math.ceil((1000 / 64).toDouble / 3).toInt)
    assert(byDoc(1L).map(_.frame_idx).sorted.toSeq == (0 until 1000 / 64 by 3).toSeq)
    assert(byDoc(2L).length == 1) // 100/64 = 1 fake frame
  }

  test("stub decoder produces deterministic features with a stable schema") {
    val docs = Tables.load(spark, Sf0001, "documents").limit(20)
    // application/* routes to the stub (image/* now decodes for real)
    val media = Multimodal.asMedia(docs, col("doc_id"), col("text"), "application/fake")
    val feats = Multimodal.decodeFeatures(spark, media)
    assert(feats.schema.fieldNames.toSeq ==
      Seq("doc_id", "mime", "n_bytes", "width", "height", "feature"))
    val a = feats.collect().sortBy(_.doc_id)
    val b = Multimodal.decodeFeatures(spark, media).collect().sortBy(_.doc_id)
    assert(a.map(_.width).toSeq == b.map(_.width).toSeq)
    assert(a.forall(f => f.feature.length == 8 && f.width >= 16 && f.height >= 16))
  }

  test("javax.imageio decodes real PNGs: exact dims and channel means") {
    // solid-color PNGs: every decoded value is predictable arithmetic
    val rows = Seq(
      (1L, 20, 40, 0xff0000), // pure red
      (2L, 64, 16, 0x00ff00), // pure green
      (3L, 33, 33, 0x102030)) // mixed
    val media = rows.map { case (id, w, h, rgb) =>
      (id, Multimodal.syntheticPng(w, h, rgb), "image/png")
    }.toDF("doc_id", "payload", "mime")
    val out = Multimodal.decodeFeatures(spark, media)
      .collect().sortBy(_.doc_id)
    assert(out.map(f => (f.doc_id, f.width, f.height)).toSeq ==
      rows.map(r => (r._1, r._2, r._3)))
    val red = out(0)
    assert(math.abs(red.feature(0) - 1.0f) < 1e-3) // mean R
    assert(red.feature(1) < 1e-3 && red.feature(2) < 1e-3)
    assert(math.abs(red.feature(7) - 0.299f) < 1e-3) // luma of pure red
    val mixed = out(2)
    assert(math.abs(mixed.feature(0) - 0x10 / 255.0f) < 1e-3)
    assert(math.abs(mixed.feature(1) - 0x20 / 255.0f) < 1e-3)
    assert(math.abs(mixed.feature(2) - 0x30 / 255.0f) < 1e-3)
    // quadrant lumas of a solid image all equal the overall luma
    assert((3 to 6).forall(i => math.abs(mixed.feature(i) - mixed.feature(7)) < 1e-4))

    // resize keeps the real decoded dims' aspect
    val resized = Multimodal.resize(spark,
      Multimodal.decodeFeatures(spark, media), maxSide = 10)
      .collect().sortBy(_.doc_id)
    assert(resized.map(f => (f.width, f.height)).toSeq ==
      Seq((5, 10), (10, 2), (10, 10)))

    // JPEG round-trips too (lossy, so dims only)
    val img = new java.awt.image.BufferedImage(
      24, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = Seq((9L, bos.toByteArray, "image/jpeg"))
      .toDF("doc_id", "payload", "mime")
    val jf = Multimodal.decodeFeatures(spark, jpeg).collect().head
    assert(jf.width == 24 && jf.height == 12)
  }

  test("javax.sound decodes real PCM WAVs: exact format and segment RMS") {
    // square wave: every |sample| == A, so all 8 segment RMS values are
    // EXACTLY A/2^15 (power-of-two normalization is exact in float)
    val media = Seq(
      (1L, Multimodal.syntheticWav(320, 12000), "audio/wav"),
      (2L, Multimodal.syntheticWav(800, 777, sampleRate = 16000), "audio/wav"))
      .toDF("doc_id", "payload", "mime")
    val out = Multimodal.decodeFeatures(spark, media).collect().sortBy(_.doc_id)
    assert(out.map(f => (f.width, f.height)).toSeq == Seq((1, 8000), (1, 16000)))
    assert(out(0).feature.toSeq == Seq.fill(8)(12000f / 32768f))
    assert(out(1).feature.toSeq == Seq.fill(8)(777f / 32768f))
    // the routing is per-MIME: the same bytes under a video MIME hit
    // the stub, not the audio codec
    val vid = Seq((3L, Multimodal.syntheticWav(320, 12000), "video/mp4"))
      .toDF("doc_id", "payload", "mime")
    val vf = Multimodal.decodeFeatures(spark, vid).collect().head
    val (sw, sh, _) = Multimodal.StubDecoder.decode(Multimodal.syntheticWav(320, 12000))
    assert(vf.width == sw && vf.height == sh)
    // corrupt audio fails loudly, not silently
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeFeatures(spark,
        Seq((4L, Array[Byte](1, 2, 3), "audio/wav")).toDF("doc_id", "payload", "mime"))
        .collect()
    }
  }

  test("AVI video decodes for real: RIFF parse + per-frame imageio") {
    // Motion-PNG (lossless frames): every decoded value is exact
    val frames = Seq(0xff0000, 0x00ff00, 0x0000ff, 0x102030)
      .map(Multimodal.syntheticPng(24, 12, _))
    val avi = Multimodal.syntheticAvi(frames, 24, 12)
    val (w, h, parsed) = Multimodal.parseAvi(avi)
    assert((w, h, parsed.length) == (24, 12, 4))
    assert(parsed.head.sameElements(frames.head)) // payload round-trips

    val media = Seq((1L, avi, "video/avi")).toDF("doc_id", "payload", "mime")
    val summary = Multimodal.decodeFeatures(spark, media).collect().head
    assert(summary.width == 24 && summary.height == 12)
    assert(math.abs(summary.feature(0) - 1.0f) < 1e-3) // first frame = pure red

    // frame stream: every 2nd frame, features match each frame's color
    val fs = Multimodal.videoFrames(spark, media, everyNth = 2)
      .collect().sortBy(_.frame_idx)
    assert(fs.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(math.abs(fs(0).feature(0) - 1.0f) < 1e-3) // red frame
    assert(math.abs(fs(1).feature(2) - 1.0f) < 1e-3) // blue frame

    // real MJPEG (lossy codec, classic capture format): container
    // structure and dims are exact, pixel means only approximate
    val jf = frames.map { png =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val mjpeg = Multimodal.syntheticAvi(jf, 24, 12, fourcc = "MJPG")
    val mediaJ = Seq((2L, mjpeg, "video/x-msvideo")).toDF("doc_id", "payload", "mime")
    val sj = Multimodal.decodeFeatures(spark, mediaJ).collect().head
    assert(sj.width == 24 && sj.height == 12)
    assert(math.abs(sj.feature(0) - 1.0f) < 0.05) // JPEG-lossy red
    assert(Multimodal.videoFrames(spark, mediaJ, everyNth = 1).collect().length == 4)

    // non-AVI video keeps the documented stub route; corrupt AVI bytes
    // fail loudly
    val stubbed = Multimodal.decodeFeatures(spark,
      Seq((3L, avi, "video/mp4")).toDF("doc_id", "payload", "mime")).collect().head
    val (sw2, sh2, _) = Multimodal.StubDecoder.decode(avi)
    assert(stubbed.width == sw2 && stubbed.height == sh2)
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeFeatures(spark,
        Seq((5L, Array[Byte](82, 73, 70), "video/avi")).toDF("doc_id", "payload", "mime"))
        .collect()
    }
  }

  test("scene-cut detection flags the planted jump, lossless and lossy") {
    // slow gray drift with one hard cut to a bright frame at index 3
    val colors = Seq(0x404040, 0x424242, 0x444444, 0xc0e0f0, 0xc2e2f2, 0xc4e4f4)
    val frames = colors.map(Multimodal.syntheticPng(20, 20, _))
    val avi = Multimodal.syntheticAvi(frames, 20, 20)
    val media = Seq((1L, avi, "video/avi")).toDF("doc_id", "payload", "mime")
    val edges = Multimodal.videoScenes(spark, media, thresholdMilli = 100)
      .collect().sortBy(_.frame_idx)
    assert(edges.map(_.frame_idx).toSeq == Seq(1, 2, 3, 4, 5))
    assert(edges.filter(_.is_cut).map(_.frame_idx).toSeq == Seq(3))
    // drift edges measure the 2/255 step, the cut the 0x40c0-ish jump
    assert(edges.filter(_.frame_idx != 3).forall(_.diff_milli <= 10))
    assert(edges.find(_.frame_idx == 3).get.diff_milli > 400)

    // the same cut survives a lossy MJPEG round-trip (means shift a
    // little, the jump does not disappear)
    val jf = frames.map { png =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val mjpeg = Multimodal.syntheticAvi(jf, 20, 20, fourcc = "MJPG")
    val ej = Multimodal.videoScenes(spark,
      Seq((2L, mjpeg, "video/avi")).toDF("doc_id", "payload", "mime"),
      thresholdMilli = 100).collect()
    assert(ej.filter(_.is_cut).map(_.frame_idx).toSeq == Seq(3))
  }
}
