package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end HTTP parity with the reference Flask walkthrough: POST a job,
  * GET the final output object, point-lookup a key.
  */
class HttpFrontEndSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private lazy val client = HttpClient.newHttpClient()

  private def get(url: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(url: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("POST /launch_map_reduce then GET /final_output and /lookup (reference verbs)") {
    val corpus = Files.createTempDirectory("graft-http-corpus")
    Files.writeString(corpus.resolve("a.txt"), "alpha beta\nalpha\n")
    val out = Files.createTempDirectory("graft-http-out").toString + "/wc"

    val server = HttpFrontEnd.start(spark, None, port = 0)
    val base = s"http://localhost:${server.getAddress.getPort}"
    try {
      assert(get(s"$base/").body().contains("running"))

      // before any job: final_output is a client error, not a crash
      assert(get(s"$base/final_output").statusCode() == 500)

      // launch with the REFERENCE's field spellings (app.py boots from
      // config.json with operation_name / raw_input_data_path / ...)
      val launch = post(s"$base/launch_map_reduce",
        s"""{"operation_name": "wordcount",
           | "raw_input_data_path": "${corpus.toString}",
           | "output_data_path": "$out"}""".stripMargin)
      assert(launch.statusCode() == 200, launch.body())
      assert(launch.body().contains(""""status":"complete""""))

      // final output is ONE object keyed by word, like the reference's
      // final-output dict
      val outBody = get(s"$base/final_output").body()
      assert(outBody.contains(""""alpha": 2"""), outBody)
      assert(outBody.contains(""""beta": 1"""), outBody)
      assert(outBody.trim.startsWith("{") && outBody.trim.endsWith("}"))

      val hit = get(s"$base/lookup?term=alpha")
      assert(hit.statusCode() == 200)
      assert(hit.body().contains("alpha") && hit.body().contains("2"), hit.body())

      val miss = get(s"$base/lookup")
      assert(miss.statusCode() == 400)

      // side-effecting launch must not run on a GET (prefetch/crawler safety)
      assert(get(s"$base/launch_map_reduce").statusCode() == 405)
      assert(post(s"$base/final_output", "{}").statusCode() == 405)
    } finally server.stop(0)
  }

  test("serves a manifest-published keyed parquet result (the incremental-stream layout)") {
    // the server's verbs must read the generation-manifest table the
    // UPDATE-mode stream maintains, not just the JSON artifact — the
    // serving path goes through the same fetchResult manifest resolution
    import spark.implicits._
    val out = Files.createTempDirectory("graft-http-inc").toString + "/r"
    graft.sources.Sinks.mergeIntoKeyedParquet(
      Seq(("alpha", 2L), ("beta", 1L)).toDF("word", "count"), "word", out)

    val server = HttpFrontEnd.start(spark,
      Some(JobConfig("wordcount", "/nonexistent", out)), port = 0)
    val base = s"http://localhost:${server.getAddress.getPort}"
    try {
      val body = get(s"$base/final_output").body()
      assert(body.contains(""""alpha": 2""") && body.contains(""""beta": 1"""), body)
      val hit = get(s"$base/lookup?term=beta").body()
      assert(hit.contains("beta") && hit.contains("1"), hit)
    } finally server.stop(0)
  }

  test("GET /bm25?q=... serves parameterized ranked retrieval over the tables dir") {
    val server = HttpFrontEnd.start(spark, None, port = 0,
      tablesDir = Some(SparkTestBase.Sf0001))
    val base = s"http://localhost:${server.getAddress.getPort}"
    try {
      // a corpus-present query term ranks documents; k bounds the result
      val r = get(s"$base/bm25?q=join+filter&k=5")
      assert(r.statusCode() == 200, r.body())
      val body = r.body()
      assert(body.trim.startsWith("[") && body.contains("\"score\""), body)
      assert(body.split("\"doc_id\"").length - 1 <= 5, body)

      // query terms are cleaned like indexed tokens: punctuation/case
      // differences must not change the result
      val clean = get(s"$base/bm25?q=JOIN!+filter&k=5").body()
      assert(clean == body, s"normalized query diverged:\n$clean\nvs\n$body")

      assert(get(s"$base/bm25").statusCode() == 400)          // missing q
      assert(get(s"$base/bm25?q=%2C%2C").statusCode() == 400) // no valid terms

      // unconfigured tables dir answers 400, not a crash
      val bare = HttpFrontEnd.start(spark, None, port = 0)
      try assert(get(s"http://localhost:${bare.getAddress.getPort}/bm25?q=x")
        .statusCode() == 400)
      finally bare.stop(0)
    } finally server.stop(0)
  }
}
