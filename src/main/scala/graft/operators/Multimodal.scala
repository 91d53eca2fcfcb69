package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus a decode/feature-extract stage.
  *
  * The Spark-side plumbing is real (schema, batched per-partition
  * processing, deterministic chunking); the actual media decode is
  * STUBBED (no image/audio libs in this container) behind
  * [[StubDecoder]], which produces deterministic fake features from the
  * payload bytes — swap in a real decoder per modality in production.
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

  /** Deterministic fake decoder — the STUB. A real implementation would
    * decode the codec here; everything around it (batching, schema,
    * partition shape) is production-real. The fake dimensions are
    * derived from the byte length alone so the decode → resize →
    * frame-sample chain is SQL-expressible and the DuckDB oracle can
    * check it end-to-end (`multimodal_resize`, `multimodal_frames`).
    */
  object StubDecoder {
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
    * analog). Returns a typed Dataset; downstream joins/aggregations
    * stay in Catalyst.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition init of the (stub) decoder happens here once
      it.map { r =>
        val (w, h, f) = StubDecoder.decode(r.payload)
        MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong, w, h, f)
      }
    }
  }
}
