package graft

import org.apache.spark.sql.functions._
import graft.gtfs.{FeedLint, GtfsPipeline}

/** Feed QA (gtfs/FeedLint): the regenerated reference feed passes every
  * rule; injected corruptions are each caught by exactly the rule that
  * owns them, with counts and key samples.
  */
class FeedLintSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val g: GtfsPipeline.Gtfs =
    GtfsPipeline.build(spark, "/root/reference")

  private def results(gt: GtfsPipeline.Gtfs): Map[String, (Long, Seq[String])] =
    FeedLint.lint(gt).as[(String, Long, Seq[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("the regenerated 126-route reference feed is lint-clean") {
    val got = results(g)
    assert(got.size == 14, s"expected 14 checks, got ${got.keys}")
    val dirty = got.filter(_._2._1 > 0)
    assert(dirty.isEmpty, s"reference feed violations: $dirty")
  }

  test("injected corruptions are caught by their owning rules") {
    // orphan stop_time (bad trip AND bad stop), duplicated stop row,
    // a time-travel stop_time, an out-of-range stop
    val badSt = Seq(("__ghost_trip", "__ghost_stop", "1",
      "12:00:00", "11:00:00", "0", "0"))
      .toDF("trip_id", "stop_id", "stop_sequence", "arrival_time",
        "departure_time", "pickup_type", "drop_off_type")
    val firstStop = g.stops.limit(1)
    val badStop = firstStop.withColumn("stop_lat", lit("95.0"))
      .withColumn("stop_id", lit("__polar_stop"))
    val corrupted = g.copy(
      stops = g.stops.unionByName(firstStop).unionByName(badStop),
      stopTimes = g.stopTimes.unionByName(badSt))
    val got = results(corrupted)
    assert(got("stop_times.trip_id_in_trips")._1 == 1)
    assert(got("stop_times.trip_id_in_trips")._2 == Seq("__ghost_trip"))
    assert(got("stop_times.stop_id_in_stops")._1 == 1)
    assert(got("stops.stop_id_unique")._1 == 1)
    assert(got("stops.coords_in_range")._2 == Seq("__polar_stop"))
    assert(got("stop_times.arrival_not_after_departure")._1 == 1)
    // the ghost stop_time also breaks its trip's gapless contract? no —
    // __ghost_trip has exactly seq 1, which IS gapless; the clean
    // checks must stay clean
    assert(got("stop_times.stop_sequence_gapless")._1 == 0)
    assert(got("trips.route_id_in_routes")._1 == 0)
  }

  test("gapless rule catches a duplicate+gap pair that min/max/count " +
    "alone would pass; coord rule flags non-numeric and null values") {
    // trip with seqs [1,2,2,4]: min=1, max=4=count — only the distinct
    // count exposes it
    val badSt = Seq(
      ("__dupseq_trip", "x1", "1"), ("__dupseq_trip", "x1", "2"),
      ("__dupseq_trip", "x1", "2"), ("__dupseq_trip", "x1", "4"))
      .map { case (t, s, q) => (t, s, q, "01:00:00", "01:00:00", "0", "0") }
      .toDF("trip_id", "stop_id", "stop_sequence", "arrival_time",
        "departure_time", "pickup_type", "drop_off_type")
    val badStops = Seq(
      ("__nan_stop", "N", "abc", "107.6", "0", "0"),
      ("__null_stop", "N", null, "107.6", "0", "0"))
      .toDF("stop_id", "stop_name", "stop_lat", "stop_lon",
        "location_type", "wheelchair_boarding")
    // lint the CSV-read shape (S8 readers yield strings — that's where
    // non-numeric coordinates can exist at all; the pipeline's internal
    // frame types lat/lon as double and a union would coerce-throw)
    val stopCols = Seq("stop_id", "stop_name", "stop_lat", "stop_lon",
      "location_type", "wheelchair_boarding")
    val stringStops = g.stops.select(
      stopCols.map(c => col(c).cast("string").as(c)): _*)
    val corrupted = g.copy(
      stops = stringStops.unionByName(badStops),
      stopTimes = g.stopTimes.unionByName(badSt))
    val got = results(corrupted)
    assert(got("stop_times.stop_sequence_gapless") ==
      ((1L, Seq("__dupseq_trip"))))
    assert(got("stops.coords_in_range")._1 == 2)
    assert(got("stops.coords_in_range")._2.toSet ==
      Set("__nan_stop", "__null_stop"))
  }

  test("GtfsApp lint gate: the clean reference feed publishes; a lint " +
    "failure aborts with the offending rule named") {
    val out = java.nio.file.Files.createTempDirectory("gtfslint").toString
    // clean feed + lint on: publishes normally
    val hashes = graft.gtfs.GtfsApp.run(spark, "/root/reference", out,
      lint = true)
    assert(hashes.nonEmpty)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(out, "gtfs.zip")))
    // the ABORT path: a corrupted feed (orphan stop_time) must throw
    // out of the gate, naming the violated rule
    val badSt = Seq(("__ghost_trip", "__ghost_stop", "1",
      "12:00:00", "12:00:00", "0", "0"))
      .toDF("trip_id", "stop_id", "stop_sequence", "arrival_time",
        "departure_time", "pickup_type", "drop_off_type")
    val corrupted = g.copy(stopTimes = g.stopTimes.unionByName(badSt))
    val e = intercept[IllegalArgumentException] {
      graft.gtfs.GtfsApp.lintGate(corrupted)
    }
    assert(e.getMessage.contains("stop_times.trip_id_in_trips"),
      s"abort message must name the rule: ${e.getMessage}")
  }

  test(">24h GTFS times do not false-positive the monotonicity rule " +
    "(integer codec, not string order)") {
    // 23:50 -> 24:10 is forward travel past service midnight — the
    // integer codec orders it correctly (a DateType/TimestampType
    // parse would reject the 24:10 outright, the SURVEY §7 hard part);
    // pair it with a genuine backwards trip to prove the rule fires
    // for the right reason
    val trips = Seq(("r1", "tA", "s1", "h", "0", "", "b1"),
      ("r1", "tB", "s1", "h", "0", "", "b2"))
      .toDF("route_id", "trip_id", "service_id", "trip_headsign",
        "direction_id", "shape_id", "block_id")
    val st = Seq(
      ("tA", "x1", "1", "23:50:00", "23:50:00", "0", "0"),
      ("tA", "x2", "2", "24:10:00", "24:10:00", "0", "0"), // fine
      ("tB", "x1", "1", "10:00:00", "10:00:00", "0", "0"),
      ("tB", "x2", "2", "09:00:00", "09:00:00", "0", "0")  // violation
    ).toDF("trip_id", "stop_id", "stop_sequence", "arrival_time",
      "departure_time", "pickup_type", "drop_off_type")
    val stops = Seq(("x1", "X1", "0.0", "0.0", "0", "0"),
      ("x2", "X2", "0.0", "0.0", "0", "0"))
      .toDF("stop_id", "stop_name", "stop_lat", "stop_lon",
        "location_type", "wheelchair_boarding")
    val routes = Seq(("r1", "a", "R", "Route", "3", "2D398B"))
      .toDF("route_id", "agency_id", "route_short_name", "route_long_name",
        "route_type", "route_color")
    val cal = Seq(("h", "1", "1", "1", "1", "1", "1", "1",
      "20250101", "20251231"))
      .toDF("service_id", "monday", "tuesday", "wednesday", "thursday",
        "friday", "saturday", "sunday", "start_date", "end_date")
    val shapes = Seq.empty[(String, String, String, String, String)]
      .toDF("shape_id", "shape_pt_lon", "shape_pt_lat",
        "shape_pt_sequence", "shape_dist_traveled")
    val agency = Seq(("a", "A", "http://a", "UTC", "id"))
      .toDF("agency_id", "agency_name", "agency_url", "agency_timezone",
        "agency_lang")
    val got = results(GtfsPipeline.Gtfs(agency, routes, stops, shapes,
      trips, st, cal))
    assert(got("stop_times.times_nondecreasing") == ((1L, Seq("tB"))))
  }
}
