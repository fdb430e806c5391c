package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S4–S6 — the Overpass OSM source (update-routes.js:48-103,159-185),
  * behind a transport trait so everything runs offline from recorded JSON
  * fixtures (SURVEY §7.1 step 3: "behind a trait so tests run offline").
  *
  * Semantics kept from the reference:
  *  - 15 s timeout, 3 attempts, 2 s × attempt linear backoff (S4);
  *  - relation fetch `[out:json];relation(<id>);out body;` (S5);
  *  - batched way/node fetch `way(id:a,b,…);out geom;` — one request per
  *    id set, driver-side batching like the reference (S6).
  *
  * Scale posture: Overpass payloads are config-scale (one relation's
  * members), so fetching happens on the driver and lands in DataFrames;
  * the expensive joins/folds downstream are distributed (graft.extract).
  */
object OverpassSource {

  /** Transport abstraction: returns the raw Overpass JSON for a query. */
  trait Transport {
    def fetch(query: String): String
  }

  /** HTTP transport with the reference's retry/backoff policy (S4/I3).
    * `sleepMs` is injectable so specs can observe the schedule.
    */
  final class HttpTransport(
      endpoint: String = "https://overpass-api.de/api/interpreter",
      timeoutMs: Int = 15000,
      attempts: Int = 3,
      backoffBaseMs: Long = 2000,
      sleepMs: Long => Unit = Thread.sleep) extends Transport {
    def fetch(query: String): String = {
      // while loop, not `for (attempt <- 1 to attempts)`: a `return`
      // inside a for-comprehension body is a NonLocalReturnControl throw,
      // which a catch-all in the same body would swallow as a "failed
      // attempt" — every fetch would then error after N good responses
      // (caught by the live-socket OverpassSpec).
      var lastErr: Throwable = null
      var attempt = 1
      while (attempt <= attempts) {
        try {
          val url = java.net.URI.create(
            endpoint + "?data=" + java.net.URLEncoder.encode(query, "UTF-8")).toURL
          val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
          conn.setConnectTimeout(timeoutMs)
          conn.setReadTimeout(timeoutMs)
          try {
            val in = conn.getInputStream
            try return new String(in.readAllBytes(), "UTF-8")
            finally in.close()
          } finally conn.disconnect()
        } catch {
          case e: Throwable =>
            lastErr = e
            if (attempt < attempts) sleepMs(backoffBaseMs * attempt)
        }
        attempt += 1
      }
      throw new RuntimeException(
        s"Overpass query failed after $attempts attempts", lastErr)
    }
  }

  /** Fixture transport: serves recorded payloads keyed by query; records
    * the issued queries for assertions.
    */
  final class FixtureTransport(payloads: Map[String, String]) extends Transport {
    val issued = scala.collection.mutable.ArrayBuffer.empty[String]
    def fetch(query: String): String = {
      issued += query
      payloads.getOrElse(query,
        throw new NoSuchElementException(s"no fixture for: $query"))
    }
  }

  /** Flaky-wrapper for retry tests: fails `failures` times, then delegates. */
  final class FlakyTransport(inner: Transport, failures: Int) extends Transport {
    private var remaining = failures
    def fetch(query: String): String = {
      if (remaining > 0) { remaining -= 1; throw new RuntimeException("flaky") }
      inner.fetch(query)
    }
  }

  val relationQuery: String => String =
    id => s"[out:json];relation($id);out body;"
  val waysQuery: Seq[String] => String =
    ids => s"[out:json];way(id:${ids.mkString(",")});out geom;"
  val nodesQuery: Seq[String] => String =
    ids => s"[out:json];node(id:${ids.mkString(",")});out geom;"

  private val ElementsSchema = StructType(Seq(
    StructField("elements", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("id", LongType),
      StructField("lon", DoubleType),
      StructField("lat", DoubleType),
      StructField("tags", MapType(StringType, StringType)),
      StructField("geometry", ArrayType(StructType(Seq(
        StructField("lon", DoubleType), StructField("lat", DoubleType))))),
      StructField("members", ArrayType(StructType(Seq(
        StructField("type", StringType),
        StructField("ref", LongType),
        StructField("role", StringType)))))))))))

  private def parse(spark: SparkSession, payloads: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.schema(ElementsSchema).json(payloads.toDS())
      .select(explode(col("elements")).as("e"))
  }

  /** S5: fetch relations → rows matching graft.extract's relations shape
    * (relation_id, members[mtype, ref, role], tags).
    */
  def relations(spark: SparkSession, t: Transport, ids: Seq[String]): DataFrame =
    parse(spark, ids.map(id => t.fetch(relationQuery(id))))
      .filter(col("e.type") === "relation")
      .select(col("e.id").as("relation_id"),
        expr("transform(e.members, m -> struct(m.type AS mtype, m.ref AS ref, m.role AS role))")
          .as("members"),
        col("e.tags").as("tags"))

  /** S6: one batched request for a set of way ids → (way_id, name,
    * geometry[lon, lat]).
    */
  def ways(spark: SparkSession, t: Transport, ids: Seq[String]): DataFrame =
    parse(spark, Seq(t.fetch(waysQuery(ids))))
      .filter(col("e.type") === "way")
      .select(col("e.id").as("way_id"),
        element_at(col("e.tags"), "name").as("name"),
        col("e.geometry").as("geometry"))

  /** S6: one batched request for a set of node ids → (node_id, lon, lat,
    * tags).
    */
  def nodes(spark: SparkSession, t: Transport, ids: Seq[String]): DataFrame =
    parse(spark, Seq(t.fetch(nodesQuery(ids))))
      .filter(col("e.type") === "node")
      .select(col("e.id").as("node_id"), col("e.lon").as("lon"),
        col("e.lat").as("lat"), col("e.tags").as("tags"))

  /** A1: dedup config routes by relationId keeping the LAST occurrence
    * (the reference's JS Map overwrite, update-routes.js:37).
    */
  def dedupRoutesLastWins(routes: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("relation_id"))
      .orderBy(col("cat_idx").desc, col("group_idx").desc, col("route_idx").desc)
    routes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
