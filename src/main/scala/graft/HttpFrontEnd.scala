package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

/** HTTP front end — literal-form parity with the reference's Flask app
  * (reference `app.py:14-46`), so a user driving the reference via its
  * Postman walkthrough can hit the same verbs here:
  *
  *   - `GET  /`                  — health banner (`app.py:14-16`)
  *   - `POST /launch_map_reduce` — run the configured job (`app.py:18-21`);
  *     body = a job-config JSON (either field spelling, see
  *     [[JobConfig.fromJsonFile]]) or empty to re-run the boot config
  *   - `GET  /final_output`      — the stored result as ONE JSON object
  *     keyed by the result's key column (`app.py:23-46` returns the KV
  *     store's `final-output` dict)
  *   - `GET  /lookup?term=x`     — PDF Part-2 "Streaming Search": one key
  *   - `GET  /bm25?q=a+b[&k=20]` — ranked Okapi retrieval over the
  *     server-configured tables directory (an ENGINE extension, not a
  *     reference verb): the parameterized
  *     [[graft.queries.CurationQueries.bm25TopkFor]], taking the user's
  *     query the way `lookup` takes its term. The corpus dir is fixed at
  *     server start (`tablesDir`) — never user-supplied, so no request
  *     can point the scan at an arbitrary path.
  *
  * Serving-layer only: every handler reads the small, already-aggregated
  * final artifact (same deliberate `collect()` boundary as [[Main]]);
  * the JDK's built-in server keeps the library dependency-free.
  */
object HttpFrontEnd {

  /** Start serving; `port = 0` binds an ephemeral port (tests).
    * `tablesDir`: the parquet tables directory `/bm25` ranks against
    * (None → the endpoint answers 400).
    */
  def start(spark: SparkSession, bootConfig: Option[JobConfig],
      port: Int, tablesDir: Option[String] = None): HttpServer = {
    @volatile var current: Option[JobConfig] = bootConfig
    // one launch at a time: concurrent Engine.run calls for the same
    // output would race in the shared .inprogress staging directory
    val launchLock = new Object
    val server = HttpServer.create(new InetSocketAddress(port), 0)

    server.createContext("/", (x: HttpExchange) =>
      if (x.getRequestURI.getPath != "/") respond(x, 404, """{"error":"not found"}""")
      else respond(x, 200, "<h1>graft engine is running</h1>", "text/html"))

    server.createContext("/launch_map_reduce", (x: HttpExchange) =>
      handle(x, method = "POST") { // side-effecting: never run on GET prefetches
        val body = new String(x.getRequestBody.readAllBytes(), UTF_8).trim
        val cfg =
          if (body.isEmpty)
            current.getOrElse(throw new IllegalArgumentException(
              "no boot config and empty body — POST a job-config JSON"))
          else {
            // JobConfig parses config FILES (spark.read.json); stage the body
            val f = java.nio.file.Files.createTempFile("graft-job", ".json")
            java.nio.file.Files.writeString(f, body)
            try JobConfig.fromJsonFile(spark, f.toString)
            finally java.nio.file.Files.delete(f)
          }
        launchLock.synchronized {
          Engine.run(spark, cfg)
          current = Some(cfg)
        }
        val n = Engine.fetchResult(spark, cfg.outputPath).count()
        (200, s"""{"status":"complete","operation":${JsonUtil.escape(cfg.operation)},"rows":$n}""")
      })

    server.createContext("/final_output", (x: HttpExchange) =>
      handle(x, method = "GET") {
        val cfg = current.getOrElse(throw new IllegalStateException(
          "no job has run yet"))
        (200, resultObject(spark, cfg.outputPath))
      })

    server.createContext("/lookup", (x: HttpExchange) =>
      handle(x, method = "GET") {
        val cfg = current.getOrElse(throw new IllegalStateException(
          "no job has run yet"))
        val term = Option(x.getRequestURI.getQuery).getOrElse("")
          .split("&").collectFirst {
            case kv if kv.startsWith("term=") =>
              java.net.URLDecoder.decode(kv.drop(5), "UTF-8")
          }.getOrElse(throw new IllegalArgumentException("missing ?term="))
        val rows = Engine.lookup(spark, cfg.outputPath, term).toJSON.collect()
        (200, rows.mkString("[", ",", "]"))
      })

    server.createContext("/bm25", (x: HttpExchange) =>
      handle(x, method = "GET") {
        val dir = tablesDir.getOrElse(throw new IllegalArgumentException(
          "bm25 serving is not configured (no tables directory)"))
        val params = Option(x.getRequestURI.getQuery).getOrElse("")
          .split("&").flatMap(_.split("=", 2) match {
            case Array(k, v) => Some(k -> java.net.URLDecoder.decode(v, "UTF-8"))
            case _ => None
          }).toMap
        val terms = params.getOrElse("q",
            throw new IllegalArgumentException("missing ?q="))
          .split("[,\\s]+").toSeq.filter(_.nonEmpty)
        val k = math.min(100, math.max(1,
          params.get("k").map(_.toInt).getOrElse(20)))
        // small result (top-k rows) — the same deliberate collect()
        // serving boundary as every handler here
        val rows = graft.queries.CurationQueries
          .bm25TopkFor(spark, dir, terms, k).toJSON.collect()
        (200, rows.mkString("[", ",", "]"))
      })

    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
    server
  }

  /** The stored result as one JSON object keyed by the sink's key column —
    * the reference's final-output dict shape (word → count for wordcount,
    * word → doc list for invertedindex). Results with more than one value
    * column fall back to an array of row objects.
    */
  private def resultObject(spark: SparkSession, outputPath: String): String = {
    import graft.sources.Sinks
    val df = Engine.fetchResult(spark, outputPath)
    val key = Sinks.readKeyColumn(spark, outputPath).getOrElse(df.columns.head)
    val valueCols = df.columns.filterNot(_ == key)
    if (valueCols.length != 1) {
      df.toJSON.collect().mkString("[", ",", "]")
    } else {
      val v = valueCols.head
      // orderBy: the JSON artifact happens to be pre-sorted, but the
      // parquet-backed incremental result arrives in bucket order — the
      // reference's final-output dict is key-sorted
      df.select(key, v).orderBy(key).collect()
        .map(r => s"${JsonUtil.escape(String.valueOf(r.get(0)))}: ${renderJson(r.get(1))}")
        .mkString("{", ", ", "}")
    }
  }

  private def renderJson(v: Any): String = v match {
    case null => "null"
    case s: String => JsonUtil.escape(s)
    case xs: scala.collection.Seq[_] => xs.map(renderJson).mkString("[", ", ", "]")
    case other => other.toString // numbers / booleans
  }

  private def handle(x: HttpExchange, method: String)(body: => (Int, String)): Unit = {
    val (code, payload) =
      if (x.getRequestMethod != method)
        (405, s"""{"error":"use $method"}""")
      else
        try body
        catch {
          case e: IllegalArgumentException => (400, s"""{"error":${JsonUtil.escape(e.getMessage)}}""")
          case e: Exception => (500, s"""{"error":${JsonUtil.escape(String.valueOf(e.getMessage))}}""")
        }
        finally
          // every handler fully materializes its payload (collect/count)
          // before reaching here, so checkpoints retired by the request's
          // query are releasable — the serving session gets the same
          // between-queries lifecycle as Bench/Verify instead of
          // accumulating blocks until shutdown (r10 VERDICT missing #2)
          graft.operators.Checkpoints.drain()
    respond(x, code, payload)
  }

  private def respond(x: HttpExchange, code: Int, payload: String,
      contentType: String = "application/json"): Unit = {
    val bytes = payload.getBytes(UTF_8)
    x.getResponseHeaders.set("Content-Type", contentType)
    x.sendResponseHeaders(code, bytes.length)
    try x.getResponseBody.write(bytes) finally x.close()
  }
}
