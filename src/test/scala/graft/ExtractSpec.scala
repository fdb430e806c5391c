package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.extract.{Extract, GeoKernels}

/** P1 extraction operators: pure-kernel unit tests (stitching, projection,
  * synthesis — update-routes.js semantics) plus a golden replay: for an
  * angkot route, the reference's checked-in stops.geojson was produced from
  * exactly the linestring in its ways.geojson + its real stops, so
  * re-running the synthesis must reproduce the virtual stops (ids are
  * coordinate-derived) and the final order.
  */
class ExtractSpec extends SparkTestBase {

  import GeoKernels._
  import spark.implicits._

  test("stitchWays reverses a way whose end touches the running end") {
    val w1 = IndexedSeq((0.0, 0.0), (1.0, 0.0))
    val w2r = IndexedSeq((2.0, 0.0), (1.0, 0.0)) // needs reversal
    val out = stitchWays(Seq(w1, w2r))
    assert(out == IndexedSeq((0.0, 0.0), (1.0, 0.0), (2.0, 0.0)))
  }

  test("stitchWays drops the duplicated joint coordinate") {
    val w1 = IndexedSeq((0.0, 0.0), (1.0, 0.0))
    val w2 = IndexedSeq((1.0, 0.0), (2.0, 0.0))
    assert(stitchWays(Seq(w1, w2)) ==
      IndexedSeq((0.0, 0.0), (1.0, 0.0), (2.0, 0.0)))
  }

  test("stitchWays keeps both coords on a discontinuity (warn-only)") {
    val w1 = IndexedSeq((0.0, 0.0), (1.0, 0.0))
    val w2 = IndexedSeq((5.0, 5.0), (6.0, 5.0))
    // first coord of w2 is sliced (stitched non-empty) like the reference
    assert(stitchWays(Seq(w1, w2)) == IndexedSeq((0.0, 0.0), (1.0, 0.0), (6.0, 5.0)))
  }

  test("projectPointToLine clamps t and uses haversine distance") {
    val line = IndexedSeq((0.0, 0.0), (1.0, 0.0))
    val (fiMid, dMid) = projectPointToLine((0.5, 0.1), line)
    assert(math.abs(fiMid - 0.5) < 1e-12)
    assert(math.abs(dMid - 0.1 * math.Pi / 180 * 6371e3) < 50) // ~11.1 km
    val (fiBefore, _) = projectPointToLine((-0.5, 0.0), line)
    assert(fiBefore == 0.0) // clamped to segment start
    val (fiAfter, _) = projectPointToLine((2.0, 0.0), line)
    assert(fiAfter == 1.0) // clamped to end of (only) segment 0
  }

  test("synthesizeStops inserts evenly spaced virtuals and sweeps") {
    // ~1.1 km straight line along the equator; real stops at the ends.
    val line = IndexedSeq((0.0, 0.0), (0.01, 0.0))
    val a = Stop("a", "A", "stop", 0.0, 0.0, isReal = true)
    val b = Stop("b", "B", "stop", 0.01, 0.0, isReal = true)
    val out = synthesizeStops(line, Seq(a, b), Map.empty)
    val virt = out.filter(!_.isReal)
    // 1.113 km / 0.25 => 4 virtuals at ~222 m spacing, all >=150 m apart
    assert(virt.size == 4, out.map(_.id).mkString(","))
    assert(out.head.id == "a" && out.last.id == "b")
    assert(virt.forall(_.id.startsWith("virtual_")))
    val gaps = out.sliding(2).map { case Seq(x, y) =>
      haversineM((x.lon, x.lat), (y.lon, y.lat)) }.toSeq
    assert(gaps.forall(_ >= 150))
  }

  test("synthesizeStops drops virtuals within 150 m of a real stop") {
    val line = IndexedSeq((0.0, 0.0), (0.004, 0.0)) // ~445 m
    val a = Stop("a", "A", "stop", 0.0, 0.0, isReal = true)
    val b = Stop("b", "B", "stop", 0.004, 0.0, isReal = true)
    // gap 445 m > 250 → 1 virtual at midpoint (~222 m from each) — kept;
    // but with ends at ~289 m the midpoint is <150 m from both ends:
    val shortLine = IndexedSeq((0.0, 0.0), (0.0026, 0.0)) // ~289 m
    val c = Stop("c", "C", "stop", 0.0026, 0.0, isReal = true)
    val near = synthesizeStops(shortLine,
      Seq(Stop("a", "A", "stop", 0.0, 0.0, isReal = true), c), Map.empty)
    assert(near.count(!_.isReal) == 0, near.mkString(","))
    val far = synthesizeStops(line, Seq(a, b), Map.empty)
    assert(far.count(!_.isReal) == 1)
  }

  private val relSchema = StructType(Seq(
    StructField("relation_id", LongType),
    StructField("members", ArrayType(StructType(Seq(
      StructField("mtype", StringType),
      StructField("ref", LongType),
      StructField("role", StringType)))))))

  private val waySchema = StructType(Seq(
    StructField("way_id", LongType),
    StructField("name", StringType),
    StructField("geometry", ArrayType(StructType(Seq(
      StructField("lon", DoubleType), StructField("lat", DoubleType)))))))

  private val nodeSchema = StructType(Seq(
    StructField("node_id", LongType),
    StructField("lon", DoubleType), StructField("lat", DoubleType),
    StructField("tags", MapType(StringType, StringType))))

  test("stitchedLines joins member-ordered ways and stitches per relation") {
    val rels = spark.createDataFrame(
      java.util.List.of(
        Row(7L, java.util.List.of(
          Row("way", 1L, ""), Row("node", 9L, "stop"), Row("way", 2L, "")))),
      relSchema)
    val ways = spark.createDataFrame(
      java.util.List.of(
        Row(1L, "Jl. A", java.util.List.of(Row(0.0, 0.0), Row(1.0, 0.0))),
        Row(2L, "Jl. B", java.util.List.of(Row(2.0, 0.0), Row(1.0, 0.0)))),
      waySchema)
    val got = Extract.stitchedLines(Extract.orderedWays(rels, ways))
      .selectExpr("relation_id", "transform(coords, c -> array(c._1, c._2)) AS cs")
      .collect()
    assert(got.length == 1)
    assert(got(0).getSeq[Seq[Double]](1) ==
      Seq(Seq(0.0, 0.0), Seq(1.0, 0.0), Seq(2.0, 0.0)))
  }

  test("angkotStops end-to-end on a synthetic relation") {
    val rels = spark.createDataFrame(
      java.util.List.of(
        Row(7L, java.util.List.of(
          Row("way", 1L, ""),
          Row("node", 9L, "stop"), Row("node", 10L, "stop"),
          Row("node", 11L, "platform")))), // platform role filtered (F6)
      relSchema)
    val ways = spark.createDataFrame(
      java.util.List.of(
        Row(1L, "Jl. Raya", java.util.List.of(Row(0.0, 0.0), Row(0.01, 0.0)))),
      waySchema)
    val nodes = spark.createDataFrame(
      java.util.List.of(
        Row(9L, 0.0, 0.0, java.util.Map.of("name", "Start")),
        Row(10L, 0.01, 0.0, java.util.Map.of("name", "End")),
        Row(11L, 0.005, 0.0, java.util.Map.of("name", "Ignored"))),
      nodeSchema)
    val out = Extract.angkotStops(rels, ways, nodes)
      .orderBy("stop_seq").collect()
    assert(out.head.getAs[String]("stop_id") == "9")
    assert(out.head.getAs[String]("stop_name") == "Start")
    assert(out.last.getAs[String]("stop_id") == "10")
    val virt = out.filter(!_.getAs[Boolean]("is_real"))
    assert(virt.length == 4)
    // J8: virtual names resolve to the way name at interpolated coords only
    // when the coordinate exactly matches a way vertex; fallback otherwise.
    assert(virt.forall(r => r.getAs[String]("stop_name") == "Jalan terdekat"))
  }

  test("geojsonDocs assembles valid FeatureCollections (K2)") {
    val lines = Seq((7L, Seq((0.0, 0.0), (0.01, 0.0))))
      .toDF("relation_id", "coords")
    val stops = Seq((7L, 0, "9", "Start", "stop", 0.0, 0.0, true))
      .toDF("relation_id", "stop_seq", "stop_id", "stop_name", "role",
        "lon", "lat", "is_real")
    // first_way_id through the production helper (min member_idx way)
    val rels = spark.createDataFrame(
      java.util.List.of(
        Row(7L, java.util.List.of(Row("way", 31L, ""), Row("way", 32L, "")))),
      relSchema)
    val waysFx = spark.createDataFrame(
      java.util.List.of(
        Row(31L, "Jl. A", java.util.List.of(Row(0.0, 0.0), Row(0.01, 0.0))),
        Row(32L, "Jl. B", java.util.List.of(Row(0.01, 0.0), Row(0.02, 0.0)))),
      waySchema)
    val firstWays = Extract.firstWayIds(Extract.orderedWays(rels, waysFx))
    val doc = Extract.geojsonDocs(lines, stops, Some(firstWays)).collect()(0)
    val ways = spark.read.json(Seq(doc.getAs[String]("ways_geojson")).toDS())
    val sj = spark.read.json(Seq(doc.getAs[String]("stops_geojson")).toDS())
    assert(ways.selectExpr("features[0].geometry.type").first.getString(0) == "LineString")
    // reference ways.geojson properties (update-routes.js:405-408)
    assert(ways.selectExpr("features[0].properties.id").first.getLong(0) == 31L)
    assert(ways.selectExpr("features[0].properties.relationId").first.getString(0) == "7")
    assert(sj.selectExpr("features[0].properties.id").first.getString(0) == "9")
    assert(sj.selectExpr("features[0].properties.isReal").first.getBoolean(0))
  }

  test("taggedStopsGeojson spreads OSM tags and round-trips into stopFeatures") {
    val rels = spark.createDataFrame(
      java.util.List.of(
        Row(42L, java.util.List.of(
          Row("node", 9L, "stop"), Row("node", 10L, "stop")))),
      relSchema)
    val nodes = spark.createDataFrame(
      java.util.List.of(
        Row(9L, 107.6, -6.9,
          java.util.Map.of("name", "Stasiun A", "wheelchair", "yes",
            "railway", "station")),
        Row(10L, 107.7, -6.91, java.util.Map.of("name", "Stasiun B"))),
      nodeSchema)
    val docs = Extract.taggedStopsGeojson(rels, nodes).collect()
    assert(docs.length == 1)
    // write like the reference's per-route layout and re-read through the
    // production scan: tags must survive into the pipeline's stop columns
    val dir = java.nio.file.Files.createTempDirectory("tagged")
    java.nio.file.Files.createDirectories(dir.resolve("42"))
    java.nio.file.Files.writeString(dir.resolve("42/stops.geojson"),
      docs(0).getAs[String]("stops_geojson"))
    val back = graft.sources.GtfsSources.stopFeatures(spark, dir.toString)
      .orderBy("feature_idx").collect()
    assert(back.map(_.getAs[String]("stop_id")).toSeq == Seq("9", "10"))
    assert(back.head.getAs[String]("stop_name") == "Stasiun A")
    assert(back.head.getAs[String]("wheelchair") == "yes")
    assert(back(1).getAs[String]("wheelchair") == null)
    // tag spread is dynamic: un-modeled tags ride along in the JSON
    val raw = spark.read.option("multiLine", "true")
      .json(dir.resolve("42/stops.geojson").toString)
    assert(raw.selectExpr("features[0].properties.railway")
      .first.getString(0) == "station")
  }

  test("golden replay: angkot route 3415464 virtual stops regenerate exactly") {
    val dir = "/root/reference/route-data/geojson/3415464"
    val (line, realStops, wantIdRole) = ujsonFree(dir)
    val got = GeoKernels.synthesizeStops(line, realStops, Map.empty)
    assert(got.map(s => (s.id, s.role)) == wantIdRole,
      s"got=${got.map(_.id).take(8)} want=${wantIdRole.map(_._1).take(8)}")
  }

  /** Parse ways/stops geojson with Spark's JSON reader (no extra deps). */
  private def ujsonFree(dir: String):
      (IndexedSeq[(Double, Double)], Seq[GeoKernels.Stop], Seq[(String, String)]) = {
    val ways = spark.read.option("multiLine", "true").json(s"$dir/ways.geojson")
    val line = ways.selectExpr("explode(features) AS f")
      .selectExpr("explode(f.geometry.coordinates) AS c")
      .collect().map(r => { val s = r.getSeq[Double](0); (s(0), s(1)) }).toIndexedSeq
    val stops = spark.read.option("multiLine", "true").json(s"$dir/stops.geojson")
      .selectExpr("posexplode(features) AS (i, f)")
      .selectExpr("i", "f.properties.id AS id", "f.properties.name AS name",
        "f.properties.role AS role", "f.properties.isReal AS isReal",
        "f.geometry.coordinates AS c")
      .orderBy("i").collect()
    val real = stops.filter(_.getAs[Boolean]("isReal")).map { r =>
      val c = r.getSeq[Double](5)
      GeoKernels.Stop(r.getAs[String]("id"), r.getAs[String]("name"),
        r.getAs[String]("role"), c(0), c(1), isReal = true)
    }.toSeq
    val want = stops.map(r => (r.getAs[String]("id"), r.getAs[String]("role"))).toSeq
    (line, real, want)
  }
}
