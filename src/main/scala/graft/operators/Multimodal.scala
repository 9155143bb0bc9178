package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object entering the decoder boundary: opaque binary payload +
  * the expression-computed metadata that rides along through it.
  */
case class MediaWithMeta(doc_id: Long, payload: Array[Byte], byte_len: Int, sha: String)

/** Extracted per-object features. */
case class MediaFeatures(
    doc_id: Long, byte_len: Int, sha: String,
    width: Int, height: Int, channels: Int)

/** Multimodal column plumbing: image/audio/video as opaque `BINARY` columns
  * with typed metadata, features extracted partition-wise.
  *
  * The actual codecs (image decode, resample, frame-sample) are NOT in this
  * container — [[MediaDecoder.decode]] is a clearly-marked STUB with a
  * deterministic fake. The split matters for the plan: everything a Catalyst
  * expression can compute (`sha2`, `octet_length`) is computed as a
  * codegen'd projection BEFORE the object boundary; only the codec call —
  * the one thing built-ins genuinely can't express — runs inside
  * `mapPartitions` (one iterator per partition, the Scala analog of
  * `mapInPandas` Arrow batches, so a real decoder with per-partition init
  * drops in without touching the plan).
  */
object Multimodal {

  object MediaDecoder {
    /** Decode: REAL `javax.imageio` path for actual image payloads (PNG /
      * JPEG / GIF / BMP by magic-byte sniff — the formats the JDK's
      * built-in readers cover, no external codec), returning true
      * (width, height, color components). Non-image payloads — the
      * catalog's docs-as-media stand-ins — keep the deterministic
      * length-derived fake, so the oracle mirrors stay exact while the
      * decode seam itself is exercised for real (MultimodalSpec decodes
      * a committed PNG fixture through this path). Audio/video codecs
      * are still outside this container; they'd slot in behind the same
      * sniff.
      */
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      val img =
        if (looksLikeImage(payload))
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          catch { case scala.util.control.NonFatal(_) => null }
        else null
      if (img != null) (img.getWidth, img.getHeight, img.getColorModel.getNumComponents)
      else {
        val len = payload.length
        ((len % 64) + 1, (len % 48) + 1, 3)
      }
    }

    /** Magic-byte sniff for the JDK-decodable formats. */
    private[graft] def looksLikeImage(b: Array[Byte]): Boolean =
      b != null && b.length >= 8 && (
        (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
        (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) ||
        (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||
        (b(0) == 'B' && b(1) == 'M'))
  }

  /** Wrap the documents table as a media table: payload = UTF-8 bytes of
    * `text` standing in for an encoded image. Real pipelines read binary
    * files (`spark.read.format("binaryFile")`) into the same schema.
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast("long").as("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("image/fake").as("media_type"))

  /** Feature extraction. `byte_len` and `sha` are plain Catalyst
    * expressions (whole-stage codegen, no per-row JVM digest objects); the
    * single object boundary exists only to host the decoder, initialized
    * once per partition, executor-side — no driver collect.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media
      .select(col("doc_id").cast("long").as("doc_id"), col("payload"),
        octet_length(col("payload")).as("byte_len"),
        sha2(col("payload"), 256).as("sha"))
      .as[MediaWithMeta]
      .mapPartitions { records =>
        // real decoder init (codec context, model handle, …) goes here
        records.map { r =>
          val (w, h, c) = MediaDecoder.decode(r.payload)
          MediaFeatures(r.doc_id, r.byte_len, r.sha, w, h, c)
        }
      }
  }

  /** Aspect-preserving resize plan over extracted features: fit (width,
    * height) into a (maxW × maxH) box, never upscale. The geometry is pure
    * codegen'd arithmetic — engine work, value-checked by the oracle; the
    * actual pixel resample belongs to the codec behind the
    * [[MediaDecoder.decode]] boundary.
    */
  def planResize(features: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    // Targets come from the INTEGER product divided by the binding
    // dimension — floor(width * scale) through the double ratio rounds
    // down at exact-fit boundaries (96 * (32/96) = 31.999… → 31).
    // w*maxH etc. are exact in doubles and IEEE division is correctly
    // rounded, so floor((h*maxW)/w) is the true floored quotient.
    val w = col("width")
    val h = col("height")
    val widthBound = lit(maxW) * h <= lit(maxH) * w // maxW/w is the smaller ratio
    features
      .withColumn("scale",
        least(lit(maxW) / w, lit(maxH) / h, lit(1.0)))
      .withColumn("target_width",
        when(w <= maxW && h <= maxH, w) // never upscale
          .when(widthBound, lit(maxW))
          .otherwise(greatest(floor((w * maxH) / h), lit(1)))
          .cast("int"))
      .withColumn("target_height",
        when(w <= maxW && h <= maxH, h)
          .when(widthBound, greatest(floor((h * maxW) / w), lit(1)))
          .otherwise(lit(maxH))
          .cast("int"))
  }
}
