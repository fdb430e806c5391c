package graft

import graft.sources.OverpassSource
import graft.sources.OverpassSource._
import graft.extract.{Extract, GeoKernels}
import org.apache.spark.sql.functions._

/** S4–S6 Overpass connector offline: fixture-served payloads through the
  * full extract pipeline, retry/backoff schedule, batched-id queries,
  * A1 last-wins dedup, G5 line slice.
  */
class OverpassSpec extends SparkTestBase {
  import spark.implicits._

  private val relationJson =
    """{"elements":[{"type":"relation","id":7,
      |"members":[{"type":"way","ref":1,"role":""},
      |           {"type":"node","ref":9,"role":"stop"}],
      |"tags":{"name":"Route 7"}}]}""".stripMargin.replace("\n", "")
  private val waysJson =
    """{"elements":[{"type":"way","id":1,"tags":{"name":"Jl. A"},
      |"geometry":[{"lon":0.0,"lat":0.0},{"lon":0.01,"lat":0.0}]}]}"""
      .stripMargin.replace("\n", "")
  private val nodesJson =
    """{"elements":[{"type":"node","id":9,"lon":0.0,"lat":0.0,
      |"tags":{"name":"Start"}}]}""".stripMargin.replace("\n", "")

  private def fixture = new FixtureTransport(Map(
    relationQuery("7") -> relationJson,
    waysQuery(Seq("1")) -> waysJson,
    nodesQuery(Seq("9")) -> nodesJson))

  test("fixture payloads parse into the extract-pipeline shapes") {
    val t = fixture
    val rels = OverpassSource.relations(spark, t, Seq("7"))
    val ways = OverpassSource.ways(spark, t, Seq("1"))
    val nodes = OverpassSource.nodes(spark, t, Seq("9"))
    assert(rels.select("relation_id").as[Long].head() == 7L)
    assert(t.issued.size == 3)
    // flows into stitching end-to-end
    val line = Extract.stitchedLines(Extract.orderedWays(rels, ways))
      .selectExpr("size(coords)").as[Int].head()
    assert(line == 2)
    assert(nodes.select("lon").as[Double].head() == 0.0)
  }

  test("batched query format matches the reference") {
    assert(waysQuery(Seq("1", "2", "3")) == "[out:json];way(id:1,2,3);out geom;")
    assert(relationQuery("42") == "[out:json];relation(42);out body;")
  }

  test("retry policy: 3 attempts with 2s-linear backoff, then success") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    // flaky transport inside the http wrapper shape: emulate by composing
    // the backoff loop with a transport that fails twice
    val flaky = new FlakyTransport(fixture, failures = 2)
    var result: Option[String] = None
    var lastErr: Throwable = null
    for (attempt <- 1 to 3 if result.isEmpty) {
      try result = Some(flaky.fetch(relationQuery("7")))
      catch { case e: Throwable => lastErr = e; sleeps += 2000L * attempt }
    }
    assert(result.isDefined)
    assert(sleeps.toSeq == Seq(2000L, 4000L)) // linear backoff ×attempt
  }

  // --- live-socket coverage for the real HTTP path (S4/I3): a local
  // com.sun.net.httpserver instance stands in for overpass-api.de, so the
  // exact code that runs in production (HttpURLConnection, URL encoding,
  // status handling, retry loop) is exercised end-to-end with no network.

  private def withLocalServer[A](handler: com.sun.net.httpserver.HttpExchange => Unit)
                                (f: String => A): A = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/interpreter",
      (ex: com.sun.net.httpserver.HttpExchange) =>
        try handler(ex)
        catch { case e: Throwable => System.err.println(s"[handler] $e") }
        finally ex.close())
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/api/interpreter")
    finally server.stop(0)
  }

  test("HttpTransport over a real socket: two 500s, then success") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val seenQueries = scala.collection.mutable.ArrayBuffer.empty[String]
    withLocalServer { ex =>
      seenQueries.synchronized { seenQueries += ex.getRequestURI.getRawQuery }
      if (hits.incrementAndGet() <= 2) ex.sendResponseHeaders(500, -1)
      else {
        val body = relationJson.getBytes("UTF-8")
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
      }
    } { endpoint =>
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val t = new HttpTransport(endpoint = endpoint, sleepMs = sleeps += _)
      val payload = t.fetch(relationQuery("7"))
      assert(hits.get() == 3, "two failed attempts + one success")
      assert(sleeps.toSeq == Seq(2000L, 4000L),
        "2s-linear backoff between attempts (update-routes.js:48-66)")
      // the query rides URL-encoded in the data= parameter
      assert(seenQueries.forall(_ ==
        "data=" + java.net.URLEncoder.encode(relationQuery("7"), "UTF-8")))
      // the fetched payload parses through the DataFrame pipeline
      val rels = OverpassSource.relations(spark,
        new FixtureTransport(Map(relationQuery("7") -> payload)), Seq("7"))
      assert(rels.select("relation_id").as[Long].head() == 7L)
    }
  }

  test("HttpTransport over a real socket: all attempts fail → error after ×3") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    withLocalServer { ex =>
      hits.incrementAndGet()
      ex.sendResponseHeaders(503, -1)
    } { endpoint =>
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val t = new HttpTransport(endpoint = endpoint, sleepMs = sleeps += _)
      val err = intercept[RuntimeException](t.fetch(relationQuery("7")))
      assert(err.getMessage.contains("after 3 attempts"))
      assert(hits.get() == 3)
      assert(sleeps.toSeq == Seq(2000L, 4000L),
        "no sleep after the final attempt")
    }
  }

  test("A1 last-wins route dedup by relation id") {
    val routes = Seq(
      (0, 0, 0, "r1", "first"), (0, 0, 1, "r2", "only"), (0, 1, 0, "r1", "last"))
      .toDF("cat_idx", "group_idx", "route_idx", "relation_id", "tag")
    val kept = OverpassSource.dedupRoutesLastWins(routes)
      .select("relation_id", "tag").as[(String, String)].collect().toMap
    assert(kept == Map("r1" -> "last", "r2" -> "only"))
  }

  test("G5 lineSlice interpolates endpoints and keeps interior vertices") {
    val line = IndexedSeq((0.0, 0.0), (1.0, 0.0), (2.0, 0.0), (3.0, 0.0))
    val s = GeoKernels.lineSlice(line, 0.5, 2.5)
    assert(s == IndexedSeq((0.5, 0.0), (1.0, 0.0), (2.0, 0.0), (2.5, 0.0)))
    // reversed indices give the same geographic slice
    assert(GeoKernels.lineSlice(line, 2.5, 0.5) == s)
  }
}
