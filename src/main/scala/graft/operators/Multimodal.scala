package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: opaque binary payload + typed metadata. */
case class MediaRecord(doc_id: Long, payload: Array[Byte], media_type: String)

/** Extracted per-object features. */
case class MediaFeatures(
    doc_id: Long, byte_len: Int, sha: String,
    width: Int, height: Int, channels: Int)

/** Multimodal column plumbing: image/audio/video as opaque `BINARY` columns
  * with typed metadata, features extracted partition-wise.
  *
  * The actual codecs (image decode, resample, frame-sample) are NOT in this
  * container — [[MediaDecoder.decode]] is a clearly-marked STUB with a
  * deterministic fake. Everything around it is real and exercised: the
  * binary schema, the typed `Dataset[MediaRecord]` encoding, and the
  * `mapPartitions` batch shape (one iterator per partition — the Scala
  * analog of `mapInPandas` Arrow batches, so a real decoder drops in
  * without touching the plan).
  */
object Multimodal {

  object MediaDecoder {
    /** STUB — a real implementation would hand `payload` to an image codec
      * (e.g. javax.imageio / ffmpeg) and return true dimensions. The fake is
      * a pure function of the payload so tests and oracles are exact.
      * Replace body with the codec call; signature is the contract.
      */
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      // ??? real codec goes here; deterministic fake below.
      val len = payload.length
      ((len % 64) + 1, (len % 48) + 1, 3)
    }
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

  /** Partition-wise feature extraction. Runs on executors, one partition's
    * iterator at a time — no driver collect, no per-row JVM↔codec setup
    * (a real decoder would be initialized once per partition here).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { records =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      records.map { r =>
        val (w, h, c) = MediaDecoder.decode(r.payload)
        digest.reset()
        val sha = digest.digest(r.payload).map("%02x".format(_)).mkString
        MediaFeatures(r.doc_id, r.payload.length, sha, w, h, c)
      }
    }
  }
}
