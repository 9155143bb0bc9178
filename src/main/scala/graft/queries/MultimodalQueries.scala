package graft.queries

import graft.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // ---- expression-built media payloads -------------------------------
  // Integer → byte-string encoders as codegen'd column arithmetic: each
  // byte is (value >> 8k) & 255, hex-padded to two digits, and the whole
  // header is one `unhex` of the concatenated hex string. This lets a
  // VALID RIFF/WAVE (little-endian) or ISO BMFF (big-endian) container be
  // constructed per-row inside the plan, so the REAL header parsers —
  // not the length-derived fallback — produce the query's output, and a
  // DuckDB oracle can mirror the expected header fields as arithmetic.

  private def le16(c: Column): Column = concat(
    lpad(hex(c.bitwiseAND(lit(255))), 2, "0"),
    lpad(hex(shiftright(c, 8).bitwiseAND(lit(255))), 2, "0"))

  private def le32(c: Column): Column =
    concat(le16(c.bitwiseAND(lit(65535))), le16(shiftright(c, 16).bitwiseAND(lit(65535))))

  private def be16(c: Column): Column = lpad(hex(c.bitwiseAND(lit(65535))), 4, "0")

  private def be32(c: Column): Column = lpad(hex(c), 8, "0")

  private def zeros(nBytes: Int): Column = lit("00" * nBytes)

  /** documents → a media frame of per-row VALID canonical 44-byte-header
    * PCM WAV files: 16-bit, channels/rate derived from the doc's byte
    * length, PCM data = the doc's own bytes capped at 1 KiB and floored
    * to a whole number of frames. `javax.sound.sampled` must parse these
    * for real — if the parser (or the `looksLikeAudio` sniff) regressed,
    * the output would take the fallback arithmetic and diverge from the
    * oracle's header math on nearly every row.
    */
  private[graft] def wavMedia(docs: DataFrame): DataFrame = {
    val payload = col("text").cast("binary")
    val n = octet_length(payload)
    val ch = lit(1) + (n % 2)
    val rate = lit(8000) + (n % 3) * lit(4000)
    val block = ch * 2 // 16-bit PCM frame size
    val capped = least(n, lit(1024))
    val pcmLen = capped - (capped % block)
    val headerHex = concat(
      lit("52494646"), le32(pcmLen + 36), lit("57415645"), // "RIFF" sz "WAVE"
      lit("666D7420"), le32(lit(16)),                      // "fmt " 16
      le16(lit(1)), le16(ch), le32(rate), le32(rate * block), // PCM tag, ch, rate, byteRate
      le16(block), le16(lit(16)),                          // blockAlign, bitsPerSample
      lit("64617461"), le32(pcmLen))                       // "data" sz
    docs
      .filter(octet_length(col("text").cast("binary")) >= 8)
      .select(col("doc_id").cast("long").as("doc_id"),
        concat(unhex(headerHex), payload.substr(lit(1), pcmLen)).as("payload"),
        lit("audio/wav").as("media_type"))
  }

  /** documents → a media frame of per-row VALID minimal ISO BMFF movies:
    * `ftyp` + `moov(mvhd + trak(tkhd))`, 232 bytes, big-endian box sizes,
    * v0 fullboxes, width/height in 16.16 fixed point, timescale 600 (the
    * classic QuickTime unit, so duration→ms is a REAL division, not a
    * no-op). The BMFF walk must parse these for real: the fallback would
    * derive from the constant 232-byte payload length, diverging from the
    * oracle's per-doc header math.
    */
  private[graft] def mp4Media(docs: DataFrame): DataFrame = {
    val n = octet_length(col("text").cast("binary"))
    val w = lit(16) + (n % 320)
    val h = lit(16) + (n % 240)
    val dur = n % 100000 // timescale-600 units
    val mvhd = concat(
      be32(lit(108)), lit("6D766864"), lit("00000000"), // size "mvhd" fullbox v0
      be32(lit(0)), be32(lit(0)),                       // ctime mtime
      be32(lit(600)), be32(dur),                        // timescale duration
      lit("00010000"), lit("0100"), zeros(10),          // rate volume reserved
      zeros(36), zeros(24), be32(lit(2)))               // matrix pre_defined next_track
    val tkhd = concat(
      be32(lit(92)), lit("746B6864"), lit("00000007"),  // size "tkhd" fullbox v0+flags
      be32(lit(0)), be32(lit(0)),                       // ctime mtime
      be32(lit(1)), be32(lit(0)), be32(dur),            // track_ID reserved duration
      zeros(16), zeros(36),                             // reserved/layer/group/volume, matrix
      be16(w), lit("0000"), be16(h), lit("0000"))       // width, height as 16.16
    val fileHex = concat(
      be32(lit(16)), lit("66747970"), lit("69736F6D"), be32(lit(0)), // ftyp isom 0
      be32(lit(216)), lit("6D6F6F76"),                  // moov
      mvhd,
      be32(lit(100)), lit("7472616B"),                  // trak
      tkhd)
    docs.select(col("doc_id").cast("long").as("doc_id"),
      unhex(fileHex).as("payload"),
      lit("video/mp4").as("media_type"))
  }

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

    // ---- REAL-parse-path oracles: the payloads are expression-built
    // VALID containers (see wavMedia/mp4Media), so `javax.sound.sampled`
    // and the BMFF walk — not the fallback — produce every output row,
    // and the DuckDB oracle checks the parsed header fields as
    // arithmetic. A sniff inversion or parser regression falls back to
    // length-derived values (constant-232-byte for MP4, 44+pcm-length
    // for WAV) and hash-mismatches. ----
    "multimodal_audio_real" -> ((s, dir) => {
      Multimodal.extractAudioFeatures(s, wavMedia(Tables(s, dir, "documents")))
        .toDF()
        .select("doc_id", "byte_len", "frames", "sample_rate", "channels")
        .orderBy("doc_id")
    }),

    "multimodal_video_real" -> ((s, dir) => {
      Multimodal.extractVideoFeatures(s, mp4Media(Tables(s, dir, "documents")))
        .toDF()
        .select("doc_id", "byte_len", "width", "height", "duration_ms", "tracks")
        .orderBy("doc_id")
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

    // The real-parse oracles mirror the HEADER FIELDS the parsers must
    // read back from the expression-built containers: WAV frames =
    // data-chunk bytes / blockAlign with data capped at 1 KiB of doc
    // bytes; MP4 duration_ms = duration * 1000 / timescale-600 in
    // integer math, byte_len = the fixed 232-byte container.
    "multimodal_audio_real" ->
      """SELECT doc_id,
        |  CAST(44 + pcm_len AS INT) AS byte_len,
        |  CAST(pcm_len // block AS BIGINT) AS frames,
        |  rate AS sample_rate,
        |  ch AS channels
        |FROM (
        |  SELECT doc_id, ch, rate, ch * 2 AS block,
        |    least(n, 1024) - least(n, 1024) % (ch * 2) AS pcm_len
        |  FROM (
        |    SELECT doc_id, octet_length(encode(text)) AS n,
        |      CAST(1 + octet_length(encode(text)) % 2 AS INT) AS ch,
        |      CAST(8000 + (octet_length(encode(text)) % 3) * 4000 AS INT) AS rate
        |    FROM documents
        |    WHERE octet_length(encode(text)) >= 8))
        |ORDER BY doc_id""".stripMargin,

    "multimodal_video_real" ->
      """SELECT doc_id,
        |  CAST(232 AS INT) AS byte_len,
        |  CAST(16 + n % 320 AS INT) AS width,
        |  CAST(16 + n % 240 AS INT) AS height,
        |  CAST((n % 100000) * 1000 // 600 AS BIGINT) AS duration_ms,
        |  CAST(1 AS INT) AS tracks
        |FROM (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
        |ORDER BY doc_id""".stripMargin,

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
