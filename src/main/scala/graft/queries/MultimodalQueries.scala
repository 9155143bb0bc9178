package graft.queries

import graft.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal metadata extraction as a verifiable query: binary payload →
  * (byte_len, sha256, stub-decoded dimensions). The Spark side goes through
  * the REAL typed `mapPartitions` path ([[Multimodal.extractFeatures]]);
  * the oracle mirrors the deterministic stub formula in SQL, so the whole
  * plumbing — binary encoding, Dataset round-trip, partition-wise execution
  * — is value-checked.
  */
object MultimodalQueries {

  private val FramesPerDoc = 4
  private val FrameBytes = 16

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> ((s, dir) => {
      val media = Multimodal.asMedia(Tables(s, dir, "documents"))
      Multimodal.extractFeatures(s, media).toDF().orderBy("doc_id")
    }),

    // ---- resize planning: aspect-preserving fit into a 32×32 box over the
    // stub-decoded dimensions; never upscale. Geometry as codegen'd
    // arithmetic (the pixel resample is codec-side). ----
    "multimodal_resize" -> ((s, dir) => {
      val media = Multimodal.asMedia(Tables(s, dir, "documents"))
      Multimodal.planResize(Multimodal.extractFeatures(s, media).toDF(), 32, 32)
        .select(col("doc_id"), col("width"), col("height"),
          col("scale"), col("target_width"), col("target_height"))
        .orderBy("doc_id")
    }),

    // ---- audio/video metadata: the real decoders (javax.sound header
    // parse, BMFF box walk) behind the same mapPartitions seam; on the
    // docs-as-media stand-in corpus every payload takes the deterministic
    // fallback, which the oracle mirrors in SQL — so the plumbing (binary
    // encode, Dataset round-trip, partition-wise decode) is value-checked
    // end-to-end while the REAL parse paths are spec-checked on committed
    // fixtures (MultimodalSpec). ----
    "multimodal_audio" -> ((s, dir) => {
      val media = Multimodal.asMedia(Tables(s, dir, "documents"))
      Multimodal.extractAudioFeatures(s, media).toDF().orderBy("doc_id")
    }),

    "multimodal_video" -> ((s, dir) => {
      val media = Multimodal.asMedia(Tables(s, dir, "documents"))
      Multimodal.extractVideoFeatures(s, media).toDF().orderBy("doc_id")
    }),

    // ---- frame sampling: k evenly-spaced byte windows per binary payload
    // (the video-frame-sample shape: payload stands in for an encoded
    // stream, a real pipeline would decode at each offset). Pure
    // expressions — offsets are arithmetic, the window is a binary substr,
    // and the fingerprint is md5 over the window's hex form (hex because
    // the SQL oracle's md5 only accepts VARCHAR; both engines hash the
    // identical uppercase-hex string). Linear, shuffle-free, codegen'd. ----
    "multimodal_frames" -> ((s, dir) => {
      val media = Multimodal.asMedia(Tables(s, dir, "documents"))
      media
        .select(col("doc_id"), col("payload"), octet_length(col("payload")).as("n"))
        .filter(col("n") >= FramesPerDoc)
        .select(col("doc_id"), col("payload"), col("n"),
          explode(sequence(lit(0), lit(FramesPerDoc - 1))).as("i"))
        .select(col("doc_id"), col("payload"),
          col("i").cast("int").as("frame_idx"),
          floor(col("i") * col("n") / FramesPerDoc).cast("int").as("frame_off"))
        .select(col("doc_id"), col("frame_idx"), col("frame_off"),
          md5(hex(col("payload").substr(col("frame_off") + 1, lit(FrameBytes)))).as("frame_hash"))
        .orderBy("doc_id", "frame_idx")
    })
  )

  def oracles: Map[String, String] = Map(
    "multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS byte_len,
        |  sha256(text) AS sha,
        |  CAST(octet_length(encode(text)) % 64 + 1 AS INT) AS width,
        |  CAST(octet_length(encode(text)) % 48 + 1 AS INT) AS height,
        |  3 AS channels
        |FROM documents ORDER BY doc_id""".stripMargin,

    "multimodal_resize" ->
      """SELECT doc_id, width, height, scale,
        |  CAST(CASE WHEN width <= 32 AND height <= 32 THEN width
        |            WHEN 32 * height <= 32 * width THEN 32
        |            ELSE GREATEST(FLOOR((width * 32) / height), 1) END AS INT) AS target_width,
        |  CAST(CASE WHEN width <= 32 AND height <= 32 THEN height
        |            WHEN 32 * height <= 32 * width THEN GREATEST(FLOOR((height * 32) / width), 1)
        |            ELSE 32 END AS INT) AS target_height
        |FROM (
        |  SELECT doc_id, width, height,
        |    LEAST(32 / width, 32 / height, 1.0) AS scale
        |  FROM (
        |    SELECT doc_id,
        |      CAST(octet_length(encode(text)) % 64 + 1 AS INT) AS width,
        |      CAST(octet_length(encode(text)) % 48 + 1 AS INT) AS height
        |    FROM documents))
        |ORDER BY doc_id""".stripMargin,

    "multimodal_audio" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS byte_len,
        |  sha256(text) AS sha,
        |  CAST(octet_length(encode(text)) % 4096 AS BIGINT) AS frames,
        |  CAST(8000 + (octet_length(encode(text)) % 3) * 4000 AS INT) AS sample_rate,
        |  CAST(1 + octet_length(encode(text)) % 2 AS INT) AS channels
        |FROM documents ORDER BY doc_id""".stripMargin,

    "multimodal_video" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS byte_len,
        |  sha256(text) AS sha,
        |  CAST(16 + octet_length(encode(text)) % 320 AS INT) AS width,
        |  CAST(16 + octet_length(encode(text)) % 240 AS INT) AS height,
        |  CAST(octet_length(encode(text)) % 3600000 AS BIGINT) AS duration_ms,
        |  CAST(1 + octet_length(encode(text)) % 3 AS INT) AS tracks
        |FROM documents ORDER BY doc_id""".stripMargin,

    "multimodal_frames" ->
      s"""SELECT doc_id, CAST(i AS INT) AS frame_idx,
         |  CAST(FLOOR(i * n / $FramesPerDoc) AS INT) AS frame_off,
         |  md5(substring(hx, CAST(FLOOR(i * n / $FramesPerDoc) AS INT) * 2 + 1, ${2 * FrameBytes})) AS frame_hash
         |FROM (SELECT doc_id, octet_length(encode(text)) AS n, hex(encode(text)) AS hx FROM documents),
         |     UNNEST(range($FramesPerDoc)) AS t(i)
         |WHERE n >= $FramesPerDoc
         |ORDER BY doc_id, frame_idx""".stripMargin
  )
}
