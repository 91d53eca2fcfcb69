package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus a decode/feature-extract stage.
  *
  * The Spark-side plumbing is real (schema, batched per-partition
  * processing, deterministic chunking). Decoding is per-MIME:
  * PNG/JPEG/BMP/GIF go through the REAL pure-JVM [[ImageIoDecoder]]
  * (`javax.imageio`) and PCM WAV/AIFF/AU audio through the REAL
  * [[WavDecoder]] (`javax.sound.sampled`) — no native codecs needed
  * for either; video (no pure-JVM codec in the JDK) stays on the
  * deterministic [[StubDecoder]], which produces fake features from
  * the payload bytes — swap in a real decoder in production.
  *
  * Per-partition batch processing (`mapPartitions` over an iterator) is
  * the Scala analog of `mapInPandas`: the decoder amortizes model/codec
  * init once per partition, which is the property that matters at
  * 100 TB.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, payload: Array[Byte], mime: String)
  final case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Long,
      width: Int, height: Int, feature: Array[Float])

  /** Text/binary columns → media records (payload = utf-8 bytes here;
    * real pipelines read binary parquet columns the same way).
    */
  def asMedia(docs: DataFrame, idCol: Column, payload: Column, mime: String): DataFrame =
    docs.select(
      idCol.cast("bigint").as("doc_id"),
      payload.cast("binary").as("payload"),
      lit(mime).as("mime"))

  /** Declarative metadata over the binary payload (no decode needed):
    * byte size, 256-byte chunk count, header hash. All codegen'd.
    */
  def metadata(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("mime"),
      octet_length(col("payload")).cast("bigint").as("n_bytes"),
      floor((octet_length(col("payload")).cast("bigint") + 255) / 256.0).cast("bigint")
        .as("chunk_count"),
      md5(substring(col("payload"), 1, 64)).as("header_md5"))

  /** One modality's decode: payload bytes → (width, height, feature).
    * Implementations must be deterministic and serializable (they ship
    * to executors; construction is once per partition).
    */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte]): (Int, Int, Array[Float])
  }

  /** Deterministic fake decoder — the STUB for modalities with no
    * pure-JVM codec in this container (audio, video). Everything
    * around it (batching, schema, partition shape) is production-real.
    * The fake dimensions are derived from the byte length alone so the
    * decode → resize → frame-sample chain is SQL-expressible and the
    * DuckDB oracle can check it end-to-end (`multimodal_resize`,
    * `multimodal_frames`).
    */
  object StubDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
      val n = payload.length
      val width = 16 + ((7 * n) % 64)
      val height = 16 + (n % 64)
      val feature = Array.tabulate(8) { i =>
        if (n == 0) 0f
        else payload(i % n).toFloat / 127f
      }
      (width, height, feature)
    }
  }

  /** REAL image decode via pure-JVM `javax.imageio` (PNG, JPEG, BMP,
    * GIF ship with the JDK — no native libraries): actual pixel
    * dimensions plus an 8-float content feature — per-channel RGB
    * means and the luma mean of each quadrant (top-left, top-right,
    * bottom-left, bottom-right), sampled on a bounded grid (≤ 64 steps
    * per axis) so a 100-megapixel scan costs the same as a thumbnail.
    * One row failing to decode fails loudly (corrupt corpus bytes
    * should surface, not silently become zeros) — pre-filter payloads
    * by magic number if the corpus is dirty.
    */
  object ImageIoDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      val stepX = math.max(1, w / 64)
      val stepY = math.max(1, h / 64)
      val sumRgb = new Array[Double](3)
      val quadLuma = new Array[Double](4)
      val quadN = new Array[Long](4)
      var n = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          sumRgb(0) += r; sumRgb(1) += g; sumRgb(2) += b
          val q = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
          quadLuma(q) += 0.299 * r + 0.587 * g + 0.114 * b
          quadN(q) += 1
          n += 1
          x += stepX
        }
        y += stepY
      }
      val feature = Array.tabulate(8) { i =>
        if (i < 3) (sumRgb(i) / math.max(1L, n) / 255.0).toFloat
        else if (i < 7) (quadLuma(i - 3) / math.max(1L, quadN(i - 3)) / 255.0).toFloat
        else (quadLuma.sum / math.max(1L, n) / 255.0).toFloat // overall luma
      }
      (w, h, feature)
    }
  }

  /** REAL audio decode via pure-JVM `javax.sound.sampled` (PCM WAV/
    * AIFF/AU ship with the JDK — no native codecs): actual format
    * metadata (channels, sample rate) plus an 8-float temporal energy
    * profile — the RMS of eight equal sample segments, normalized by
    * 16-bit full scale (2^15, a power of two, so integer amplitudes
    * survive the float path EXACTLY — what makes the decode
    * arithmetic-oracle-checkable). The (width, height) slots of the
    * shared decoder contract carry (channels, sampleRate).
    */
  object WavDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16,
          s"only 16-bit PCM supported, got ${fmt.getSampleSizeInBits}-bit")
        val data = ais.readAllBytes()
        val n = data.length / 2
        require(n > 0, "empty audio payload")
        val feature = new Array[Float](8)
        var seg = 0
        while (seg < 8) {
          val lo = seg * n / 8
          val hi = if (seg == 7) n else (seg + 1) * n / 8
          var sumSq = 0.0
          var i = lo
          while (i < hi) {
            val s =
              if (fmt.isBigEndian) ((data(2 * i) << 8) | (data(2 * i + 1) & 0xff)).toShort
              else ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort
            sumSq += s.toDouble * s.toDouble
            i += 1
          }
          feature(seg) =
            (math.sqrt(sumSq / math.max(1, hi - lo)) / 32768.0).toFloat
          seg += 1
        }
        (fmt.getChannels, fmt.getSampleRate.toInt, feature)
      } finally ais.close()
    }
  }

  /** MIME → decoder routing: images and audio decode for real; video
    * (no pure-JVM codec in the JDK) runs the documented stub.
    */
  def decoderFor(mime: String): MediaDecoder =
    if (mime.startsWith("image/")) ImageIoDecoder
    else if (mime.startsWith("audio/")) WavDecoder
    else StubDecoder

  /** Deterministic solid-color PNG bytes — the planted-image fixture
    * for [[ImageIoDecoder]]: dimensions and channel means are pure
    * arithmetic in the inputs, so a SQL oracle can predict the decoded
    * output of a REAL codec round-trip (encode here, `javax.imageio`
    * decode in the operator).
    */
  def syntheticPng(width: Int, height: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic mono 16-bit PCM WAV bytes — the planted-audio
    * fixture for [[WavDecoder]]: a square wave of integer amplitude
    * `amplitude` (blocks of 8 frames at +A then 8 at −A), so every
    * sample's magnitude is exactly A and each segment RMS is exactly
    * A/2^15 — pure doc-id arithmetic for the oracle.
    */
  def syntheticWav(
      nFrames: Int, amplitude: Int, sampleRate: Int = 8000): Array[Byte] = {
    require(amplitude >= 0 && amplitude <= 32767, s"bad amplitude $amplitude")
    val dataLen = nFrames * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nFrames) {
      val s = if ((i / 8) % 2 == 0) amplitude else -amplitude
      buf.putShort(s.toShort)
      i += 1
    }
    buf.array()
  }

  /** Deterministic stand-ins for the remaining media transforms — the
    * Spark-side shape (schema, per-partition batching) is the real
    * part; the pixel/PCM math is the stub:
    *  - resize: scale the fake (width, height) and re-derive features;
    *  - frameSample: one record per sampled frame index (video → frame
    *    stream, the explode-shaped op a real pipeline runs).
    */
  def resize(
      spark: SparkSession, feats: Dataset[MediaFeatures],
      maxSide: Int): Dataset[MediaFeatures] = {
    import spark.implicits._
    feats.map { f =>
      val scale = math.min(1.0, maxSide.toDouble / math.max(f.width, f.height))
      f.copy(
        width = math.max(1, (f.width * scale).toInt),
        height = math.max(1, (f.height * scale).toInt))
    }
  }

  final case class Frame(doc_id: Long, frame_idx: Int, feature: Array[Float])

  def frameSample(
      spark: SparkSession, media: DataFrame, everyNth: Int): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.flatMap { r =>
        val (_, _, feature) = StubDecoder.decode(r.payload)
        val nFrames = math.max(1, r.payload.length / 64) // fake frame count
        (0 until nFrames by everyNth).map(i =>
          Frame(r.doc_id, i, feature.map(_ * (1.0f + i))))
      }
    }
  }

  /** Decode + feature-extract, batched per partition (mapInPandas
    * analog), decoder picked per record's MIME ([[decoderFor]]: images
    * real, the rest stubbed). Returns a typed Dataset; downstream
    * joins/aggregations stay in Catalyst.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition decoder init happens here once (objects in this
      // build; a model/codec handle in a production decoder)
      it.map { r =>
        val (w, h, f) = decoderFor(r.mime).decode(r.payload)
        MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong, w, h, f)
      }
    }
  }
}
