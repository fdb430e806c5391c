package graft.gtfs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GTFS feed QA — the engine-native slice of the gtfs-validator class
  * (MobilityData canonical rules): referential integrity, sequence
  * shape, coordinate/time sanity over a feed's seven core tables. The
  * reference regenerates its feed in CI and hands correctness to
  * downstream consumers (OTP rejects broken feeds at graph-build time);
  * this makes the checks first-class queries over the SAME DataFrames
  * the writer emits, so a pipeline can gate publishing on them (compose
  * with the I2 content-hash gate or the s16 WAP expectations).
  *
  * Every check is one distributed pass — an anti-join for referential
  * rules (broadcast-eligible: the dimension side is routes/trips/
  * calendar-sized), a window for per-trip/per-shape monotonicity, a
  * filter for scalar sanity — unioned into one small result:
  * (check, n_violations, sample) with up to 3 offending keys each.
  * Nothing collects; the result is O(#checks).
  */
object FeedLint {

  /** One check row: count + a deterministic 3-key sample. The sample
    * comes from a distinct-sort-limit pass, NOT a collect_set slice —
    * a badly broken feed (every row violating) would otherwise
    * accumulate millions of distinct keys in one aggregation buffer,
    * the exact unbounded-single-key class the engine caps everywhere
    * else. Two bounded passes over `bad` beat one unbounded buffer.
    */
  private def check(name: String, bad: DataFrame, keyCol: Column): DataFrame = {
    val ks = bad.select(coalesce(keyCol.cast("string"), lit("<null>"))
      .as("k"))
    val n = ks.agg(count(lit(1)).as("n_violations"))
    val sample = ks.distinct().orderBy(col("k")).limit(3)
      .agg(collect_list(col("k")).as("sample"))
    n.crossJoin(sample)
      .select(lit(name).as("check"), col("n_violations"), col("sample"))
  }

  /** Run the full rule set. Returns (check, n_violations, sample),
    * ordered by check name; a clean feed is all-zeros.
    */
  def lint(g: GtfsPipeline.Gtfs): DataFrame = {
    val st = g.stopTimes
    val trips = g.trips

    // referential integrity (GTFS required foreign keys)
    val orphanStTrip = check("stop_times.trip_id_in_trips",
      st.join(trips.select(col("trip_id")), Seq("trip_id"), "left_anti"),
      col("trip_id"))
    val orphanStStop = check("stop_times.stop_id_in_stops",
      st.join(g.stops.select(col("stop_id")), Seq("stop_id"), "left_anti"),
      col("stop_id"))
    val orphanTripRoute = check("trips.route_id_in_routes",
      trips.join(g.routes.select(col("route_id")), Seq("route_id"),
        "left_anti"),
      col("route_id"))
    val orphanTripSvc = check("trips.service_id_in_calendar",
      trips.join(g.calendar.select(col("service_id")), Seq("service_id"),
        "left_anti"),
      col("service_id"))
    // non-empty shape_id must exist in shapes (empty = explicitly
    // shapeless, the reference's routes-without-ways semantics)
    val orphanTripShape = check("trips.shape_id_in_shapes",
      trips.filter(col("shape_id") =!= "")
        .join(g.shapes.select(col("shape_id")).distinct(), Seq("shape_id"),
          "left_anti"),
      col("shape_id"))

    // duplicate primary keys
    def dups(df: DataFrame, key: String, name: String) =
      check(name,
        df.groupBy(col(key)).agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1),
        col(key))
    val dupStop = dups(g.stops, "stop_id", "stops.stop_id_unique")
    val dupTrip = dups(trips, "trip_id", "trips.trip_id_unique")
    val dupRoute = dups(g.routes, "route_id", "routes.route_id_unique")

    // stop_sequence gapless 1..n per trip (the writer's contract):
    // min=1 AND max=n alone passes a duplicate+gap pair ([1,2,2,4]) —
    // the distinct count closes that hole; a non-numeric sequence
    // casts to null and fails via the null-count conjunct instead of
    // silently dropping out of min/max
    val seqI = col("stop_sequence").try_cast("int")
    val seqBad = check("stop_times.stop_sequence_gapless",
      st.groupBy(col("trip_id"))
        .agg(min(seqI).as("mn"), max(seqI).as("mx"),
          count(lit(1)).as("n"),
          count(seqI).as("n_num"),
          countDistinct(seqI).as("n_dist"))
        .filter(col("n_num") =!= col("n") || col("mn") =!= 1 ||
          col("mx") =!= col("n") || col("n_dist") =!= col("n")),
      col("trip_id"))

    // times: arrival <= departure per row; departures never decrease
    // along the trip (GTFS times are HH:MM:SS possibly >24h — the
    // engine's integer codec orders them correctly where string order
    // would not, e.g. "9:10:00" vs "10:10:00")
    import graft.functions.timecodec
    val arrS = timecodec.timeToSec(col("arrival_time"))
    val depS = timecodec.timeToSec(col("departure_time"))
    val dwellBad = check("stop_times.arrival_not_after_departure",
      st.filter(arrS > depS), col("trip_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("trip_id")).orderBy(col("stop_sequence").try_cast("int"))
    val orderBad = check("stop_times.times_nondecreasing",
      st.withColumn("__prev", lag(depS, 1).over(w))
        .filter(col("__prev").isNotNull && arrS < col("__prev")),
      col("trip_id"))

    // coordinates present, numeric, and in range: a cast failure
    // yields null and `abs(null) > 90` is null — which filter() DROPS,
    // so without the explicit null/cast disjunct a stop_lat of "abc"
    // or "" would lint clean and then break the consumer (OTP rejects
    // exactly these at graph build)
    def badCoord(c: Column, bound: Int): Column =
      c.isNull || c.try_cast("double").isNull || abs(c.try_cast("double")) > bound
    val stopCoordBad = check("stops.coords_in_range",
      g.stops.filter(badCoord(col("stop_lat"), 90) ||
        badCoord(col("stop_lon"), 180)),
      col("stop_id"))

    // shapes: per-shape sequence strictly increasing and
    // shape_dist_traveled non-decreasing
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shape_id"))
      .orderBy(col("shape_pt_sequence").try_cast("int"))
    val shapeBad = check("shapes.dist_nondecreasing",
      g.shapes
        .withColumn("__pd", lag(col("shape_dist_traveled").try_cast("double"), 1)
          .over(ws))
        .filter(col("__pd").isNotNull &&
          col("shape_dist_traveled").try_cast("double") < col("__pd")),
      col("shape_id"))

    // routes: color is 6 hex digits (the writer strips '#')
    val colorBad = check("routes.color_hex6",
      g.routes.filter(col("route_color").isNotNull &&
        col("route_color") =!= "" &&
        !col("route_color").rlike("^[0-9A-Fa-f]{6}$")),
      col("route_id"))

    Seq(orphanStTrip, orphanStStop, orphanTripRoute, orphanTripSvc,
      orphanTripShape, dupStop, dupTrip, dupRoute, seqBad, dwellBad,
      orderBad, stopCoordBad, shapeBad, colorBad)
      .reduce(_ unionByName _)
      .orderBy(col("check"))
  }
}
