package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with a typed metadata struct, processed in PARTITION-SIZED BATCHES.
  *
  * The Spark-side architecture is real and tested: schema, partitioning,
  * batch iteration, and feature output shape are exactly what a production
  * decode stage needs. The decode kernel itself is a clearly-marked STUB
  * (this container has no image/audio libraries): `decodeStub` produces a
  * deterministic fake feature vector from the bytes. In production the same
  * `mapPartitions` boundary hosts the JNI/FFmpeg/Pillow-equivalent call —
  * batch-at-a-time so codec initialization amortizes across a partition,
  * which is the property that matters at 100 TB.
  */
object Multimodal {

  /** media struct: raw bytes + typed metadata. */
  final case class MediaMeta(format: String, width: Int, height: Int, nBytes: Long)
  final case class MediaRow(media_id: Long, bytes: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, format: String, features: Array[Float])

  /** Pack any binary-bearing DataFrame into the canonical media schema.
    * For fixtures we treat document text bytes as the opaque payload.
    */
  def packDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("bytes"),
      struct(
        lit("text/plain").as("format"),
        lit(0).as("width"),
        lit(0).as("height"),
        coalesce(length(col("text").cast("binary")).cast("long"), lit(0L)).as("nBytes")).as("meta"))

  /** STUB decode kernel: deterministic fake "decoder" folding the payload
    * into an 8-float feature vector — lane j = (Σ of bytes at positions
    * ≡ j mod 8) / 255, accumulated EXACTLY in integers and rounded to
    * float once per lane. The exact-integer spelling makes the value
    * reproducible in any engine (q32's DuckDB oracle recomputes it from
    * the UTF-8 bytes), unlike per-byte float accumulation whose rounding
    * order no SQL engine can replay. Replace the body with the real codec
    * call (same signature, same batching) in production.
    */
  private def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val acc = new Array[Long](8)
    var i = 0
    while (i < bytes.length) {
      acc(i % 8) += (bytes(i) & 0xff)
      i += 1
    }
    acc.map(s => (s / 255.0).toFloat)
  }

  /** Batch feature extraction over the media column. `mapPartitions` is the
    * deliberate choice: one iterator per partition = one decoder
    * instantiation per task, not per row.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // production: initialize the decoder ONCE here, per partition
      rows.map { r =>
        val payload = if (r.bytes == null) Array.empty[Byte] else r.bytes
        MediaFeatures(r.media_id, r.meta.format, decodeStub(payload))
      }
    }
  }

  /** Frame sampling shape for video payloads: every `stride`-th fixed-size
    * window of the payload becomes a "frame" record (1→N generator). With a
    * real codec the windowing is time-based; the plan shape (generator +
    * per-partition batch decode) is identical.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame =
    media.select(col("media_id"), col("meta"),
      posexplode(transform(
        TextOps.indices1(expr(s"cast(meta.nBytes as int) div ($frameBytes * $stride)")),
        i => col("bytes").substr((i - 1) * (frameBytes * stride) + 1, lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_bytes")
      .select(col("media_id"), col("frame_idx"), col("frame_bytes"),
        length(col("frame_bytes")).cast("long").as("frame_size"))
}
