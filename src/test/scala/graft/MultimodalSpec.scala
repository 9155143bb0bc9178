package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Binary-column plumbing: schema, typed Dataset round-trip, partition-wise
  * extraction, deterministic stub decode.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("media schema is (long, binary, string)") {
    val media = Multimodal.asMedia(Tables(spark, SparkTestBase.Sf0001, "documents"))
    assert(media.schema.map(f => f.dataType.simpleString) ==
      Seq("bigint", "binary", "string"))
  }

  test("features: byte_len is UTF-8 length, sha256 is exact, decode is deterministic") {
    import spark.implicits._
    val media = Seq((1L, "abc".getBytes("UTF-8"), "image/fake"))
      .toDF("doc_id", "payload", "media_type")
    val f = Multimodal.extractFeatures(spark, media).head()
    assert(f.byte_len == 3)
    assert(f.sha == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert((f.width, f.height, f.channels) == (4, 4, 3))
  }

  test("planResize: aspect-preserving fit, never upscaling") {
    import spark.implicits._
    val features = Seq(
      (1L, 64, 48),   // downscale: fits 32x32 at scale 0.5 -> 32x24
      (2L, 10, 10),   // smaller than the box: untouched
      (3L, 100, 20),  // wide: width-bound, scale 0.32 -> 32x6
      (4L, 96, 48),   // exact-ratio boundary: 1/3 -> 32x16 (the double-ratio
                      // form computed floor(96 * 0.333...) = 31 here)
      (5L, 48, 96)):  // height-bound twin -> 16x32
      Seq[(Long, Int, Int)]
    val out = Multimodal.planResize(
        features.toDF("doc_id", "width", "height"), 32, 32)
      .select("doc_id", "target_width", "target_height")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(out(1L) == ((32, 24)))
    assert(out(2L) == ((10, 10)))
    assert(out(3L) == ((32, 6)))
    assert(out(4L) == ((32, 16)))
    assert(out(5L) == ((16, 32)))
  }

  test("extraction is partition-invariant") {
    val docs = Tables(spark, SparkTestBase.Sf0001, "documents")
    val a = Multimodal.extractFeatures(spark, Multimodal.asMedia(docs)).collect().sortBy(_.doc_id)
    val b = Multimodal.extractFeatures(spark, Multimodal.asMedia(docs.repartition(11)))
      .collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
  }

  test("real image payloads decode through javax.imageio (committed PNG fixture)") {
    val png = {
      val in = getClass.getResourceAsStream("/fixture_8x5.png")
      try in.readAllBytes() finally in.close()
    }
    // direct kernel: true dimensions, not the length-derived fake
    assert(Multimodal.MediaDecoder.looksLikeImage(png))
    assert(Multimodal.MediaDecoder.decode(png) == ((8, 5, 3)))
    // the fake would have said ((157 % 64) + 1, (157 % 48) + 1, 3)
    assert(Multimodal.MediaDecoder.decode(png) != ((png.length % 64 + 1, png.length % 48 + 1, 3)))

    // e2e through the mapPartitions seam: a real image row and a text
    // stand-in row flow through ONE plan; each takes its own path
    import spark.implicits._
    val media = Seq(
      (1L, png, "image/png"),
      (2L, "not an image".getBytes("UTF-8"), "image/fake"))
      .toDF("doc_id", "payload", "media_type")
    val out = Multimodal.extractFeatures(spark, media).collect()
      .map(f => f.doc_id -> ((f.width, f.height, f.channels))).toMap
    assert(out(1L) == ((8, 5, 3)))
    val fakeLen = "not an image".getBytes("UTF-8").length
    assert(out(2L) == ((fakeLen % 64 + 1, fakeLen % 48 + 1, 3)))

    // corrupt payload with an image magic falls back, never throws
    val corrupt = png.take(12) ++ Array.fill[Byte](4)(0)
    val cl = corrupt.length
    assert(Multimodal.MediaDecoder.decode(corrupt) == ((cl % 64 + 1, cl % 48 + 1, 3)))
  }

  /** A minimal valid PCM WAV: 16-bit mono 8 kHz, `nFrames` zero samples.
    * Hand-rolled bytes, so the javax.sound parse under test is verified
    * against an INDEPENDENT spelling of the RIFF layout.
    */
  private def pcmWav(nFrames: Int): Array[Byte] = {
    val dataSize = nFrames * 2 // 16-bit mono => blockAlign 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)            // PCM
      .putShort(1)            // channels
      .putInt(8000)           // sample rate
      .putInt(8000 * 2)       // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    bb.array()
  }

  test("real WAV payloads decode through javax.sound.sampled") {
    val wav = pcmWav(nFrames = 16)
    assert(Multimodal.MediaDecoder.looksLikeAudio(wav))
    // true header values, not the length-derived fake
    assert(Multimodal.MediaDecoder.decodeAudio(wav) == ((16L, 8000, 1)))
    val wl = wav.length
    assert(Multimodal.MediaDecoder.decodeAudio(wav) !=
      (((wl % 4096).toLong, 8000 + (wl % 3) * 4000, 1 + (wl % 2))))

    // e2e through the mapPartitions seam: a real WAV row and a text
    // stand-in row flow through ONE plan; each takes its own path
    import spark.implicits._
    val media = Seq(
      (1L, wav, "audio/wav"),
      (2L, "not audio bytes".getBytes("UTF-8"), "audio/fake"))
      .toDF("doc_id", "payload", "media_type")
    val out = Multimodal.extractAudioFeatures(spark, media).collect()
      .map(f => f.doc_id -> ((f.frames, f.sample_rate, f.channels))).toMap
    assert(out(1L) == ((16L, 8000, 1)))
    val fl = "not audio bytes".getBytes("UTF-8").length
    assert(out(2L) == (((fl % 4096).toLong, 8000 + (fl % 3) * 4000, 1 + (fl % 2))))

    // corrupt payload with a RIFF/WAVE magic falls back, never throws
    val corrupt = wav.take(12)
    assert(Multimodal.MediaDecoder.looksLikeAudio(corrupt))
    val kl = corrupt.length
    assert(Multimodal.MediaDecoder.decodeAudio(corrupt) ==
      (((kl % 4096).toLong, 8000 + (kl % 3) * 4000, 1 + (kl % 2))))
  }

  /** A minimal valid ISO BMFF movie: ftyp + moov(mvhd + trak(tkhd)).
    * Hand-rolled per ISO/IEC 14496-12 box layouts — an INDEPENDENT
    * spelling of the structure the parser under test walks. `v1` uses the
    * 64-bit (version 1) mvhd/tkhd forms to cover the widened-time path.
    */
  private def mp4(width: Int, height: Int, timescale: Int, duration: Long,
      v1: Boolean = false): Array[Byte] = {
    def box(typ: String, payload: java.nio.ByteBuffer): java.nio.ByteBuffer = {
      val p = payload.flip().asInstanceOf[java.nio.ByteBuffer]
      val bb = java.nio.ByteBuffer.allocate(8 + p.remaining())
      bb.putInt(8 + p.remaining()).put(typ.getBytes("US-ASCII")).put(p)
      bb
    }
    def bb(n: Int) = java.nio.ByteBuffer.allocate(n)
    val ftyp = box("ftyp", bb(8).put("isom".getBytes("US-ASCII")).putInt(0))
    val mvhd = {
      val b = bb(120)
      if (v1) b.putInt(0x01000000).putLong(0).putLong(0) // version 1, 64-bit times
              .putInt(timescale).putLong(duration)
      else    b.putInt(0).putInt(0).putInt(0)
              .putInt(timescale).putInt(duration.toInt)
      b.putInt(0x00010000).putShort(0x0100).put(new Array[Byte](10))
        .put(new Array[Byte](36)) // matrix
        .put(new Array[Byte](24)).putInt(2) // pre_defined + next_track_ID
      box("mvhd", b)
    }
    val tkhd = {
      val b = bb(104)
      if (v1) b.putInt(0x01000007).putLong(0).putLong(0).putInt(1).putInt(0).putLong(duration)
      else    b.putInt(7).putInt(0).putInt(0).putInt(1).putInt(0).putInt(duration.toInt)
      b.put(new Array[Byte](16)) // reserved/layer/alt_group/volume/reserved
        .put(new Array[Byte](36)) // matrix
        .putInt(width << 16).putInt(height << 16) // 16.16 fixed
      box("tkhd", b)
    }
    val trak = box("trak", bb(tkhd.flip().remaining()).put(tkhd))
    val moov = {
      val m = bb(mvhd.flip().remaining() + trak.flip().remaining()).put(mvhd).put(trak)
      box("moov", m)
    }
    val out = java.nio.ByteBuffer.allocate(
      ftyp.flip().remaining() + moov.flip().remaining())
    out.put(ftyp).put(moov).array()
  }

  test("expression-built WAV/MP4 corpora take the REAL parse path, not the fallback") {
    import graft.queries.MultimodalQueries
    val docs = Tables(spark, SparkTestBase.Sf0001, "documents")

    // Every constructed WAV must sniff as audio and parse; if the parser
    // had silently fallen back, frames would equal byte_len % 4096 — count
    // how many rows a fallback could even coincidentally explain.
    val wavRows = graft.operators.Multimodal
      .extractAudioFeatures(spark, MultimodalQueries.wavMedia(docs)).collect()
    assert(wavRows.nonEmpty)
    val wavFallbackAlike = wavRows.count { f =>
      f.frames == (f.byte_len % 4096).toLong &&
        f.sample_rate == 8000 + (f.byte_len % 3) * 4000 &&
        f.channels == 1 + f.byte_len % 2
    }
    assert(wavFallbackAlike < wavRows.length / 10,
      s"$wavFallbackAlike of ${wavRows.length} WAV rows are fallback-indistinguishable")

    // MP4s are a constant 232 bytes, so the fallback would emit ONE
    // constant (width, height, duration) triple; the parsed output must
    // vary with the source doc and never equal that constant.
    val mp4Rows = graft.operators.Multimodal
      .extractVideoFeatures(spark, MultimodalQueries.mp4Media(docs)).collect()
    assert(mp4Rows.nonEmpty)
    assert(mp4Rows.forall(_.byte_len == 232))
    val fallbackTriple = (16 + 232 % 320, 16 + 232 % 240, (232 % 3600000).toLong)
    val mp4FallbackAlike = mp4Rows.count(f => (f.width, f.height, f.duration_ms) == fallbackTriple)
    assert(mp4FallbackAlike < mp4Rows.length / 10,
      s"$mp4FallbackAlike of ${mp4Rows.length} MP4 rows are fallback-indistinguishable")
    assert(mp4Rows.map(f => (f.width, f.height)).distinct.length > 1)
  }

  test("real MP4 containers parse through the BMFF box walk") {
    val clip = mp4(width = 640, height = 360, timescale = 1000, duration = 5000)
    assert(Multimodal.MediaDecoder.looksLikeMp4(clip))
    assert(Multimodal.MediaDecoder.decodeVideo(clip) == ((640, 360, 5000L, 1)))
    // version-1 (64-bit) mvhd/tkhd: 90 s at a 90 kHz timescale
    val clipV1 = mp4(1920, 1080, 90000, 8100000L, v1 = true)
    assert(Multimodal.MediaDecoder.decodeVideo(clipV1) == ((1920, 1080, 90000L, 1)))

    // e2e through the mapPartitions seam: one real MP4 row, one text
    // stand-in row, one plan — each takes its own path
    import spark.implicits._
    val media = Seq(
      (1L, clip, "video/mp4"),
      (2L, "not a movie".getBytes("UTF-8"), "video/fake"))
      .toDF("doc_id", "payload", "media_type")
    val out = Multimodal.extractVideoFeatures(spark, media).collect()
      .map(f => f.doc_id -> ((f.width, f.height, f.duration_ms, f.tracks))).toMap
    assert(out(1L) == ((640, 360, 5000L, 1)))
    val fl = "not a movie".getBytes("UTF-8").length
    assert(out(2L) == ((16 + fl % 320, 16 + fl % 240, (fl % 3600000).toLong, 1 + fl % 3)))

    // truncated payload with a valid ftyp magic falls back, never throws
    val truncated = clip.take(40)
    assert(Multimodal.MediaDecoder.looksLikeMp4(truncated))
    val tl = truncated.length
    assert(Multimodal.MediaDecoder.decodeVideo(truncated) ==
      ((16 + tl % 320, 16 + tl % 240, (tl % 3600000).toLong, 1 + tl % 3)))
  }
}
