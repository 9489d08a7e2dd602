package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The decode step itself is a STUB (no image/audio libraries ship in this
  * sandbox): [[FakeDecoder]] derives deterministic pseudo-features from the
  * bytes. Everything around it — schema, batch shape, partitioning, the
  * typed mapPartitions pipeline (the JVM analog of mapInPandas: one decoder
  * init per partition, row-batched iteration) — is real and tested, so a real
  * decoder drops in by replacing one function.
  */
object Multimodal {

  /** Media row: payload + metadata. */
  final case class MediaRow(media_id: Long, media_type: String, payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      byte_len: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Synthesize a deterministic media table from the documents table: payload
    * = UTF-8 bytes of the text (an opaque stand-in), type from a stable hash.
    */
  def syntheticMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(xxhash64(col(idCol)), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** STUB decoder — deterministic pseudo-decode standing in for a real
    * image/audio decoder (libs absent in this sandbox). Replace this function
    * to integrate a real one; the pipeline around it is unchanged.
    */
  object FakeDecoder {
    def decode(row: MediaRow): MediaFeatures = {
      val len = row.payload.length
      var h = 1125899906842597L
      var i = 0
      while (i < len) { h = 31 * h + row.payload(i); i += 1 }
      val width = 64 + math.floorMod(h, 512).toInt
      val height = 64 + math.floorMod(h >> 9, 512).toInt
      val frames = if (row.media_type == "video") 1 + math.floorMod(h >> 18, 120).toInt else 1
      // 8-dim deterministic "embedding" of the payload
      val feat = Array.tabulate(8)(d => math.floorMod(h >> (d * 7), 1000).toFloat / 1000f)
      MediaFeatures(row.media_id, row.media_type, len.toLong, width, height, frames, feat)
    }
  }

  /** Batched decode/feature-extract: one decoder context per partition,
    * rows streamed through it (mapInPandas-shaped, JVM-typed).
    */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("media_type"), col("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition decoder init would go here (real codecs are expensive
        // to construct; amortized across the batch exactly like mapInPandas)
        rows.map(FakeDecoder.decode)
      }
  }

  /** Deterministic frame sampling plan for video rows: every `stride`-th frame
    * up to `maxFrames` — the shuffle-free plan a real frame extractor follows.
    */
  def frameSamplePlan(features: Dataset[MediaFeatures], stride: Int, maxFrames: Int): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    features
      .filter($"media_type" === "video")
      .select($"media_id", $"n_frames",
        slice(sequence(lit(0), $"n_frames" - 1, lit(stride)), 1, maxFrames).as("frame_ids"))
  }
}
