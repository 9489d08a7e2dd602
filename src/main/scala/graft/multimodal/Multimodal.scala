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
    * = UTF-8 bytes of the text (an opaque stand-in) with media_type keyed by
    * id mod 3, PLUS real image-header bytes planted on a deterministic subset
    * of the image rows (id ≡ 0 mod 7 → PNG signature+IHDR prefix, id ≡ 1
    * mod 7 → GIF87a logical-screen prefix; width = 1 + id mod 640, height =
    * 1 + id mod 480) so the contract query exercises [[HeaderDecoder]] on
    * genuine header bytes. Every rule here is integer-portable and mirrored
    * bit-for-bit by the DuckDB oracle (OracleSql.mediaFeatures) — round 3's
    * xxhash64 type assignment had no DuckDB twin and kept q_media_features
    * rows-only.
    */
  def syntheticMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val mt = math.floorMod(id, 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val w = 1 + math.floorMod(id, 640).toInt
        val h = 1 + math.floorMod(id, 480).toInt
        val payload =
          if (mt == "image" && math.floorMod(id, 7) == 0) pngHeader(w, h) ++ body
          else if (mt == "image" && math.floorMod(id, 7) == 1) gifHeader(w, h) ++ body
          else body
        MediaRow(id, mt, payload)
      }
      .toDF()
  }

  /** Real PNG signature + IHDR prefix (the 24 bytes [[HeaderDecoder.png]]
    * parses: 8-byte signature, chunk length 13, "IHDR", width/height BE32).
    */
  private[multimodal] def pngHeader(w: Int, h: Int): Array[Byte] =
    (Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a, 0, 0, 0, 13,
      'I'.toInt, 'H'.toInt, 'D'.toInt, 'R'.toInt,
      w >>> 24, (w >>> 16) & 0xff, (w >>> 8) & 0xff, w & 0xff,
      h >>> 24, (h >>> 16) & 0xff, (h >>> 8) & 0xff, h & 0xff)).map(_.toByte).toArray

  /** Real GIF87a header prefix (6-byte signature + width/height LE16). */
  private[multimodal] def gifHeader(w: Int, h: Int): Array[Byte] =
    (Seq('G'.toInt, 'I'.toInt, 'F'.toInt, '8'.toInt, '7'.toInt, 'a'.toInt,
      w & 0xff, (w >>> 8) & 0xff, h & 0xff, (h >>> 8) & 0xff)).map(_.toByte).toArray

  /** Real pure-JVM image HEADER parsing — PNG IHDR, JPEG SOF, GIF logical
    * screen descriptor — no codec libraries required. Full pixel decode /
    * audio / video codecs remain environment-blocked (see [[FakeDecoder]]),
    * but actual image dimensions come from the actual bytes.
    */
  object HeaderDecoder {

    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
    private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
    private def be32(b: Array[Byte], i: Int): Long =
      (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

    /** (width, height) if the payload starts with a recognized image header. */
    def dimensions(p: Array[Byte]): Option[(Int, Int)] =
      png(p).orElse(gif(p)).orElse(jpeg(p))

    /** PNG: 8-byte signature, 4-byte chunk length, "IHDR", width+height BE32. */
    private def png(p: Array[Byte]): Option[(Int, Int)] =
      if (p.length >= 24 &&
        u8(p, 0) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G' &&
        u8(p, 4) == 0x0d && u8(p, 5) == 0x0a && u8(p, 6) == 0x1a && u8(p, 7) == 0x0a &&
        p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R')
        Some((be32(p, 16).toInt, be32(p, 20).toInt))
      else None

    /** GIF87a/GIF89a: logical screen width/height, little-endian at 6/8. */
    private def gif(p: Array[Byte]): Option[(Int, Int)] =
      if (p.length >= 10 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == '8' && (p(4) == '7' || p(4) == '9') && p(5) == 'a')
        Some((le16(p, 6), le16(p, 8)))
      else None

    /** JPEG: walk marker segments from SOI to the first SOFn (C0..CF minus
      * C4/C8/CC); the frame header is [len][precision][height BE16][width BE16].
      */
    private def jpeg(p: Array[Byte]): Option[(Int, Int)] = {
      if (p.length < 4 || u8(p, 0) != 0xff || u8(p, 1) != 0xd8) return None
      var i = 2
      while (i + 3 < p.length) {
        if (u8(p, i) != 0xff) return None // corrupt stream: markers must align
        val marker = u8(p, i + 1)
        if (marker == 0xff) { i += 1 } // fill bytes before a marker
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) { i += 2 } // standalone
        else {
          val len = be16(p, i + 2)
          if (len < 2 || i + 2 + len > p.length) return None
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            if (len < 7) return None
            return Some((be16(p, i + 7), be16(p, i + 5)))
          }
          i += 2 + len
        }
      }
      None
    }
  }

  /** Decoder for the batched pipeline: IMAGE payloads with a recognizable
    * PNG/JPEG/GIF header get their REAL dimensions via [[HeaderDecoder]]
    * (pure JVM, no codec libs); everything else falls back to [[FakeDecoder]],
    * the declared stub for the codec work this sandbox cannot host.
    *
    * Header parsing is gated on `media_type == "image"`: a real pipeline
    * routes by the typed media column, and the DuckDB oracle models headers
    * only on image rows — an audio/video payload whose bytes coincidentally
    * start with 'GIF87a' must not be dimensioned as an image.
    */
  object Decoder {
    def decode(row: MediaRow): MediaFeatures =
      (if (row.media_type == "image") HeaderDecoder.dimensions(row.payload) else None) match {
        case Some((w, h)) =>
          val fake = FakeDecoder.decode(row) // frames + feature still synthetic
          fake.copy(width = w, height = h)
        case None => FakeDecoder.decode(row)
      }
  }

  /** STUB decoder — deterministic pseudo-decode standing in for a real
    * image/audio decoder (libs absent in this sandbox). Replace this function
    * to integrate a real one; the pipeline around it is unchanged.
    *
    * The pseudo-features derive from the PORTABLE polynomial rolling hash
    * over the payload bytes — fold of (acc·31 + byte) mod 1e9+7, the same
    * math as [[graft.text.TextAnalytics.fingerprint]] — so for ASCII payloads
    * the DuckDB oracle reproduces every emitted value exactly (the round-3
    * Java 31-hash had no SQL twin, which kept q_media_features rows-only).
    */
  object FakeDecoder {
    final val Mod = 1000000007L

    def decode(row: MediaRow): MediaFeatures = {
      val len = row.payload.length
      var h = 0L
      var i = 0
      while (i < len) { h = (h * 31 + (row.payload(i) & 0xff)) % Mod; i += 1 }
      val width = 64 + (h % 512).toInt
      val height = 64 + ((h / 512) % 512).toInt
      val frames = if (row.media_type == "video") 1 + ((h / 262144) % 120).toInt else 1
      // 8-dim deterministic "embedding" of the payload (h < 2^30: shifts safe)
      val feat = Array.tabulate(8)(d => ((h >> (d * 3)) % 1000).toFloat / 1000f)
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
        rows.map(Decoder.decode)
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
