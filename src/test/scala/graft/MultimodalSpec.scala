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
}
