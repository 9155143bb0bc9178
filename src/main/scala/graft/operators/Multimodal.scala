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

/** Extracted per-object AUDIO features: PCM frame count, sample rate in
  * Hz, channel count. `frames = -1` marks a stream whose length the
  * header doesn't declare (unspecified `AudioSystem` frame length).
  */
case class AudioFeatures(
    doc_id: Long, byte_len: Int, sha: String,
    frames: Long, sample_rate: Int, channels: Int)

/** Extracted per-object VIDEO container metadata: presentation size from
  * the first visual `tkhd`, whole-movie duration in ms from `mvhd`, and
  * the container's track count.
  */
case class VideoFeatures(
    doc_id: Long, byte_len: Int, sha: String,
    width: Int, height: Int, duration_ms: Long, tracks: Int)

/** Multimodal column plumbing: image/audio/video as opaque `BINARY` columns
  * with typed metadata, features extracted partition-wise.
  *
  * Codec posture: image headers+pixels decode for REAL via `javax.imageio`
  * (PNG/JPEG/GIF/BMP), audio headers via `javax.sound.sampled`
  * (WAV/AIFF/AU), and video CONTAINER metadata via a hand-rolled ISO BMFF
  * box walk (MP4 `moov`/`mvhd`/`tkhd`) — everything parseable without an
  * external codec; compressed audio/video SAMPLE decode is NOT in this
  * container, and non-decodable payloads fall back to a deterministic
  * length-derived fake so the stand-in corpus stays oracle-exact. The split matters for the plan: everything a Catalyst
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

    /** The installed [[javax.sound.sampled.spi.AudioFileReader]]s, resolved
      * ONCE per JVM. `AudioSystem.getAudioInputStream` re-runs the whole
      * ServiceLoader provider scan on EVERY call (the JDK dropped the sound
      * registry cache in 9+ — `JDK13Services.getProviders` builds a fresh
      * loader each time), and each scan walks `META-INF/services` across
      * the full Spark classpath (hundreds of jars) — milliseconds per call,
      * which multiplied into ~100 s of the sf10 `multimodal_audio_real`
      * floor at 500k rows. Same provider ORDER as `AudioSystem` (first
      * successful reader wins), same public SPI contract; the JDK's
      * built-in readers are stateless, so sharing across executor threads
      * is safe.
      */
    private lazy val audioReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
      import scala.jdk.CollectionConverters._
      val loaded =
        java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
          .iterator().asScala.toList
      // Container-header readers FIRST. The JDK's service order puts
      // `SoftMidiAudioFileReader` ahead of the WAV reader, and that
      // reader's every PROBE re-enters `MidiSystem.getMidiFileReaders` →
      // the synchronized per-call provider rescan — measured 2 ms/call
      // wall at 32 threads (1,201 of 1,280 stack samples BLOCKED in
      // `JSSecurityManager.getProviders`) vs 53 µs single-threaded. The
      // [[looksLikeAudio]] gate admits only RIFF/AIFF/AU payloads, so a
      // front-loaded container reader matches first and the MIDI probe
      // never runs on the hot path; non-container readers stay as tail
      // fallbacks for completeness.
      val (container, other) = loaded.partition { r =>
        val n = r.getClass.getSimpleName.toLowerCase
        n.startsWith("wave") || n.startsWith("aiff") || n.startsWith("au")
      }
      container ++ other
    }

    /** Audio decode: REAL `javax.sound.sampled` path for RIFF/WAVE (and
      * AIFF/AU — the formats the JDK's built-in providers parse without
      * external codecs), returning (frames, sampleRateHz, channels) from
      * the parsed header. Non-audio / corrupt payloads get the same
      * deterministic length-derived fake posture as the image seam, so
      * the stand-in corpus stays oracle-exact while a real WAV exercises
      * the true parse (MultimodalSpec e2e). Compressed codecs
      * (MP3/AAC/Opus) and video remain honestly outside this container.
      */
    def decodeAudio(payload: Array[Byte]): (Long, Int, Int) = {
      val parsed =
        if (looksLikeAudio(payload)) parseAudio(payload)
        else None
      parsed.getOrElse {
        val len = if (payload == null) 0 else payload.length
        ((len % 4096).toLong, 8000 + (len % 3) * 4000, 1 + (len % 2))
      }
    }

    /** First reader that accepts the payload wins — `AudioSystem`'s own
      * dispatch rule, minus its per-call provider rescan. A fresh
      * `ByteArrayInputStream` per attempt wraps the same array (no copy)
      * and trivially satisfies the SPI's mark/reset requirement.
      */
    private def parseAudio(payload: Array[Byte]): Option[(Long, Int, Int)] = {
      val it = audioReaders.iterator
      while (it.hasNext) {
        val reader = it.next()
        try {
          val in = reader.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
          try {
            val f = in.getFormat
            return Some((in.getFrameLength, f.getSampleRate.round, f.getChannels))
          } finally in.close()
        } catch { case scala.util.control.NonFatal(_) => /* next reader */ }
      }
      None
    }

    /** Magic-byte sniff for the JDK-parseable audio containers:
      * RIFF....WAVE, FORM....AIFF, and .snd (AU).
      */
    private[graft] def looksLikeAudio(b: Array[Byte]): Boolean =
      b != null && b.length >= 12 && (
        (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') ||
        (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
          b(8) == 'A' && b(9) == 'I' && b(10) == 'F' && b(11) == 'F') ||
        (b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd'))

    /** Video CONTAINER metadata: a real MP4 / ISO BMFF box-structure walk
      * (ISO/IEC 14496-12: size+fourcc boxes, `moov` → `mvhd` for
      * timescale+duration, `moov/trak/tkhd` for presentation width ×
      * height in 16.16 fixed point) — pure byte parsing, which is the
      * part of "video decode" that needs NO codec. Returns (width,
      * height, durationMs, trackCount). The compressed sample data
      * (H.264 etc.) stays honestly outside this container — a real frame
      * decode would slot in behind this same seam, after the parse has
      * told it where the samples live. Non-MP4 / truncated payloads fall
      * back to the deterministic length-derived fake, same posture as the
      * image/audio seams, so the docs-as-media stand-in corpus stays
      * oracle-exact.
      */
    def decodeVideo(payload: Array[Byte]): (Int, Int, Long, Int) =
      (if (looksLikeMp4(payload)) parseMp4(payload) else None).getOrElse {
        val len = if (payload == null) 0 else payload.length
        (16 + len % 320, 16 + len % 240, (len % 3600000).toLong, 1 + len % 3)
      }

    /** ISO BMFF sniff: box 1 is `ftyp` (fourcc at offset 4). */
    private[graft] def looksLikeMp4(b: Array[Byte]): Boolean =
      b != null && b.length >= 12 &&
        b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

    private def parseMp4(b: Array[Byte]): Option[(Int, Int, Long, Int)] =
      try {
        val bb = java.nio.ByteBuffer.wrap(b) // BMFF is big-endian
        def fourcc(off: Int): String =
          new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
        /** Walk the sibling boxes in [from, until); visit(type, payloadOff,
          * payloadEnd). 64-bit `size==1` largesize and `size==0`
          * (to-end-of-file) forms handled; a malformed size aborts the walk.
          */
        def boxes(from: Int, until: Int)(visit: (String, Int, Int) => Unit): Unit = {
          var off = from
          while (off + 8 <= until) {
            val size32 = bb.getInt(off).toLong & 0xFFFFFFFFL
            val typ = fourcc(off + 4)
            val (payloadOff, size) =
              if (size32 == 1 && off + 16 <= until) (off + 16, bb.getLong(off + 8))
              else if (size32 == 0) (off + 8, (until - off).toLong)
              else (off + 8, size32)
            val end = off + size
            if (size < 8 || end > until) return // malformed — stop, caller falls back
            visit(typ, payloadOff, end.toInt)
            off = end.toInt
          }
        }
        var timescale = 0L; var duration = 0L
        var width = 0; var height = 0; var tracks = 0
        boxes(0, b.length) { (t0, p0, e0) =>
          if (t0 == "moov") boxes(p0, e0) { (t1, p1, e1) =>
            t1 match {
              case "mvhd" =>
                val v = b(p1) & 0xFF // fullbox version: v1 widens times to 64-bit
                if (v == 1) { timescale = bb.getInt(p1 + 20).toLong & 0xFFFFFFFFL
                              duration = bb.getLong(p1 + 24) }
                else        { timescale = bb.getInt(p1 + 12).toLong & 0xFFFFFFFFL
                              duration = bb.getInt(p1 + 16).toLong & 0xFFFFFFFFL }
              case "trak" =>
                tracks += 1
                boxes(p1, e1) { (t2, p2, _) =>
                  if (t2 == "tkhd" && width == 0) {
                    val v = b(p2) & 0xFF
                    // fullbox(4) + times/id/reserved/duration (v0: 20, v1: 32)
                    // + reserved(8)+layer(2)+altgroup(2)+volume(2)+reserved(2)
                    // + matrix(36) → width/height as 16.16 fixed
                    val wOff = p2 + (if (v == 1) 32 else 20) + 4 + 16 + 36
                    val w = bb.getInt(wOff) >>> 16 // integer part of 16.16
                    val h = bb.getInt(wOff + 4) >>> 16
                    if (w > 0 && h > 0) { width = w; height = h }
                  }
                }
              case _ =>
            }
          }
        }
        if (timescale > 0 && width > 0)
          Some((width, height, duration * 1000L / timescale, tracks))
        else None
      } catch { case scala.util.control.NonFatal(_) => None }
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

  /** Audio-feature extraction — the [[extractFeatures]] pattern with the
    * audio decoder behind the same single object boundary: metadata as
    * codegen'd projections, the header parse per-partition executor-side.
    */
  def extractAudioFeatures(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media
      .select(col("doc_id").cast("long").as("doc_id"), col("payload"),
        octet_length(col("payload")).as("byte_len"),
        sha2(col("payload"), 256).as("sha"))
      .as[MediaWithMeta]
      .mapPartitions { records =>
        records.map { r =>
          val (frames, rate, ch) = MediaDecoder.decodeAudio(r.payload)
          AudioFeatures(r.doc_id, r.byte_len, r.sha, frames, rate, ch)
        }
      }
  }

  /** Video container-metadata extraction — the [[extractFeatures]] pattern
    * with the BMFF walk behind the same single object boundary.
    */
  def extractVideoFeatures(spark: SparkSession, media: DataFrame): Dataset[VideoFeatures] = {
    import spark.implicits._
    media
      .select(col("doc_id").cast("long").as("doc_id"), col("payload"),
        octet_length(col("payload")).as("byte_len"),
        sha2(col("payload"), 256).as("sha"))
      .as[MediaWithMeta]
      .mapPartitions { records =>
        records.map { r =>
          val (w, h, ms, tr) = MediaDecoder.decodeVideo(r.payload)
          VideoFeatures(r.doc_id, r.byte_len, r.sha, w, h, ms, tr)
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
