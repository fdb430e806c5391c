package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{geo, timecodec}

/** Tegallega geo/time kernels (SURVEY.md §2.4 X1–X4/X13/X14, §2.5 J5/G2,
  * §2.7 W1/W10) exercised over the driver's testdata by deriving synthetic
  * lon/lat from integer keys — the same formulas appear verbatim in the
  * DuckDB oracle, so the driver hash-checks the kernels themselves.
  *
  * Float-parity rules: transcendental results (haversine) are rounded ONCE
  * from the raw value, at a quantum far above the engines' libm
  * disagreement (~ulp); running sums accumulate integer milli-km segments
  * (mirroring the reference's round(dist, 6) idea at generate_gtfs.py:178)
  * so window order, not FP addition order, defines the result. Never
  * re-round an already-rounded value: that parks ~1% of rows on exact
  * decimal halves, where Spark (HALF_UP on the shortest decimal repr) and
  * DuckDB (round of the binary double) disagree.
  */
object GeoQ extends QueryPack {

  // -- synthetic coordinates, shared Spark + SQL ---------------------------
  private def custLon = (col("c_custkey") % 3600).cast("double") / 10 - 180
  private def custLat = ((col("c_custkey") * 7) % 1700).cast("double") / 10 - 85
  private val custLonSql = "CAST(c_custkey % 3600 AS DOUBLE)/10 - 180"
  private val custLatSql = "CAST((c_custkey * 7) % 1700 AS DOUBLE)/10 - 85"

  private def liLon = (col("l_partkey") % 3600).cast("double") / 10 - 180
  private def liLat = ((col("l_suppkey") * 13) % 1700).cast("double") / 10 - 85
  private val liLonSql = "CAST(l_partkey % 3600 AS DOUBLE)/10 - 180"
  private val liLatSql = "CAST((l_suppkey * 13) % 1700 AS DOUBLE)/10 - 85"

  private def natLon = ((col("n_nationkey") * 37) % 360).cast("double") - 179.5
  private def natLat = ((col("n_nationkey") * 23) % 160).cast("double") - 79.5
  private val natLonSql = "CAST((n_nationkey * 37) % 360 AS DOUBLE) - 179.5"
  private val natLatSql = "CAST((n_nationkey * 23) % 160 AS DOUBLE) - 79.5"

  private def suppLon = ((col("s_suppkey") * 31) % 3600).cast("double") / 10 - 180
  private def suppLat = ((col("s_suppkey") * 17) % 1700).cast("double") / 10 - 85
  private val suppLonSql = "CAST((s_suppkey * 31) % 3600 AS DOUBLE)/10 - 180"
  private val suppLatSql = "CAST((s_suppkey * 17) % 1700 AS DOUBLE)/10 - 85"

  /** DuckDB haversine METERS mirroring GeoKernels.haversineM's atan2
    * variant (the [[graft.plans.ProjectToLine]] kernel's distance) —
    * distinct from [[havKmSql]]'s asin-km form.
    */
  private def havMSql(lon1: String, lat1: String,
                      lon2: String, lat2: String): String = {
    val s = s"(sin(radians(($lat2) - ($lat1))/2)*sin(radians(($lat2) - ($lat1))/2) + " +
      s"cos(radians($lat1))*cos(radians($lat2))*" +
      s"sin(radians(($lon2) - ($lon1))/2)*sin(radians(($lon2) - ($lon1))/2))"
    // GREATEST clamp mirrors GeoKernels.haversineM's ulp guard: s > 1
    // for near-antipodal pairs must give the antipodal limit, not an
    // engine error (DuckDB) or a NaN that silently loses argmins (JVM)
    s"(6371000.0 * 2 * atan2(sqrt($s), sqrt(GREATEST(1 - $s, 0))))"
  }

  /** g10's polyline length cap: first 21 points (20 segments) per route
    * — the polylines stay a BOUNDED driver constant at every SF (the
    * codebook doctrine), so per-point matching is a pure row expression.
    */
  private val G10MaxPts = 21

  /** g08's hexagon offsets (unit shape, scaled per nation): convex,
    * integer, implicitly closed. Shared Spark + SQL.
    */
  private val PolyOffX = Seq(2, 1, -1, -2, -1, 1)
  private val PolyOffY = Seq(0, 2, 2, 0, -2, -2)

  /** DuckDB haversine with the exact operation order of functions.geo. */
  private def havKmSql(lon1: String, lat1: String, lon2: String, lat2: String): String = {
    val dLat = s"radians(($lat2) - ($lat1))/2"
    val dLon = s"radians(($lon2) - ($lon1))/2"
    s"(CAST(12742 AS DOUBLE) * asin(sqrt(sin($dLat)*sin($dLat) + " +
      s"cos(radians($lat1))*cos(radians($lat2))*sin($dLon)*sin($dLon))))"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // X1 haversine as a per-row scalar kernel (codegen'd, no UDF).
    "g01_haversine_to_hub" -> { (s, dir) =>
      Tables(s, dir).customer.select(
          col("c_custkey"),
          round(geo.haversineKm(custLon, custLat, lit(107.6), lit(-6.9)), 4)
            .as("dist_km"))
        .orderBy(col("c_custkey"))
    },

    // W1/W2: cumulative distance along an ordered per-group track — the
    // GTFS shapes window, on lineitem "tracks" keyed by order.
    "g02_cumulative_track_dist" -> { (s, dir) =>
      // (l_orderkey, l_linenumber) is NOT unique in the testdata — the
      // ordering key must be total or the lag/cumsum is nondeterministic.
      val ord = Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      val w = Window.partitionBy(col("l_orderkey")).orderBy(ord: _*)
      val cumW = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // Segments as exact milli-km BIGINTs: integer quantization keeps the
      // cumsum in codegen'd long arithmetic ("window order, not FP order,
      // defines the result") — and the metre-scale quantum keeps the
      // round() boundary ~9 orders of magnitude away from the engines'
      // libm disagreement (~ulp). At micro-km quantum, ~1 segment per
      // 200k landed on a boundary and shifted its whole track's cumsum.
      Tables(s, dir).lineitem
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), liLon.as("lon"), liLat.as("lat"))
        .withColumn("seg_mkm", coalesce(
          round(geo.haversineKm(
            lag(col("lon"), 1).over(w), lag(col("lat"), 1).over(w),
            col("lon"), col("lat")) * 1e3),
          lit(0.0)).cast("bigint"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"),
          (sum(col("seg_mkm")).over(cumW).cast("double") / 1e3).as("cum_km"))
        .orderBy(col("l_orderkey") +: ord: _*)
    },

    // J5/G2: nearest-centroid argmin join (stop-to-shape assignment shape):
    // every customer point against the broadcast 25-row centroid set.
    "g03_nearest_centroid" -> { (s, dir) =>
      val t = Tables(s, dir)
      val cents = broadcast(t.nation.select(col("n_nationkey"),
        natLon.as("cl"), natLat.as("ct")))
      val pts = t.customer.select(col("c_custkey"),
        custLon.as("lon"), custLat.as("lat"))
      val w = Window.partitionBy(col("c_custkey"))
        .orderBy(col("d6"), col("n_nationkey"))
      pts.crossJoin(cents)
        .withColumn("dkm", geo.haversineKm(col("lon"), col("lat"),
          col("cl"), col("ct")))
        .withColumn("d6", round(col("dkm"), 6))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        // emit the distance at 0.1 km resolution, rounded once from the
        // raw value: re-rounding the 6-dp intermediate puts ~1% of rows
        // on an exact decimal half, where Spark (HALF_UP on the shortest
        // decimal repr) and DuckDB (round of the binary double) disagree
        .select(col("c_custkey"), col("n_nationkey").as("nearest_key"),
          round(col("dkm"), 1).as("dist_km"))
        .orderBy(col("c_custkey"))
    },

    // X2–X4: GTFS >24h time codec round-trip (integer-exact both engines).
    "g04_time_codec_roundtrip" -> { (s, dir) =>
      Tables(s, dir).orders
        .select(col("o_orderkey"), (col("o_orderkey") % 100000).as("secs"))
        .select(col("o_orderkey"), col("secs"),
          timecodec.secToTime(col("secs")).as("hhmmss"))
        .withColumn("secs_back", timecodec.timeToSec(col("hhmmss")))
        .withColumn("junk_parsed", timecodec.timeToSec(lit("not a time")))
        .orderBy(col("o_orderkey"))
    },

    // W10/X14: virtual-point interpolation between consecutive per-group
    // points (the angkot virtual-stop synthesis shape).
    "g05_interpolated_points" -> { (s, dir) =>
      val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_custkey"))
      Tables(s, dir).customer
        .select(col("c_nationkey"), col("c_custkey"),
          custLon.as("lon"), custLat.as("lat"))
        .withColumn("plon", lag(col("lon"), 1).over(w))
        .withColumn("plat", lag(col("lat"), 1).over(w))
        .filter(col("plon").isNotNull)
        .withColumn("d4",
          round(geo.haversineKm(col("plon"), col("plat"), col("lon"), col("lat")), 4))
        .withColumn("n", least(floor(col("d4") / 2000.0), lit(4.0)).cast("int"))
        .filter(col("n") >= 1)
        .select(col("c_nationkey"), col("c_custkey"), col("plon"), col("plat"),
          col("lon"), col("lat"), col("n"),
          explode(sequence(lit(1), col("n"))).as("i"))
        .withColumn("t", col("i").cast("double") / (col("n") + 1))
        .select(col("c_nationkey"), col("c_custkey"), col("i"),
          round(geo.lerp(col("plon"), col("lon"), col("t")), 6).as("lon_i"),
          round(geo.lerp(col("plat"), col("lat"), col("t")), 6).as("lat_i"))
        .orderBy(col("c_nationkey"), col("c_custkey"), col("i"))
    },

    // Radial-distance track simplification (RadialSimplify doc): the
    // order-sensitive decimation fold — keep a point iff ≥ 5000 km from
    // the last KEPT point — on the g02 lineitem "tracks". No window
    // function expresses the evolving kept-set; the oracle replays the
    // walk as a recursive CTE carrying the last-kept coordinates (the
    // e03 pattern, with haversine as the gap).
    "g07_radial_simplify" -> { (s, dir) =>
      val pts = Tables(s, dir).lineitem.select(
        col("l_orderkey"),
        (col("l_linenumber") * 10000000000L + col("l_partkey") * 100000L +
          col("l_suppkey")).as("seq"),
        liLon.as("lon"), liLat.as("lat"))
      graft.operators.RadialSimplify
        .radialSimplify(pts, "l_orderkey", "seq", "lon", "lat",
          tolKm = 5000.0)
        .orderBy(col("l_orderkey"), col("seq"))
    },

    // Stay-point extraction on the same tracks as g07 — where did each
    // track LINGER: maximal runs of ≥3 consecutive points within
    // 5000 km of the run's anchor (RadialSimplify.stayPoints doc: the
    // identical anchor walk as the decimation fold, then one rollup).
    "g09_stay_points" -> { (s, dir) =>
      val pts = Tables(s, dir).lineitem.select(
        col("l_orderkey"),
        (col("l_linenumber") * 10000000000L + col("l_partkey") * 100000L +
          col("l_suppkey")).as("seq"),
        liLon.as("lon"), liLat.as("lat"))
      graft.operators.RadialSimplify
        .stayPoints(pts, "l_orderkey", "seq", "lon", "lat",
          tolKm = 5000.0, minPts = 3)
        .select(col("l_orderkey"), col("anchor_seq"),
          round(col("anchor_lon"), 4).as("anchor_lon"),
          round(col("anchor_lat"), 4).as("anchor_lat"), col("n_pts"))
        .orderBy(col("l_orderkey"), col("anchor_seq"))
    },

    // Point-in-polygon geofence tagging: customers (integer deci-degree
    // points) against per-nation hexagons (integer vertices; size keyed
    // off the nation id) — broadcast bbox candidates + the exact
    // integer crossing-number fold (Spatial.pointInPolygonJoin doc).
    // The oracle runs the definitional edge-unnested crossing sum.
    "g08_point_in_polygon" -> { (s, dir) =>
      val t = Tables(s, dir)
      val pts = t.customer.select(col("c_custkey"),
        (col("c_custkey") % 3600 - 1800).cast("long").as("px"),
        ((col("c_custkey") * 7) % 1700 - 850).cast("long").as("py"))
      val hx = PolyOffX.zip(PolyOffY)
      val polys = t.nation.select(col("n_nationkey"),
          (((col("n_nationkey") * 37) % 360) * 10 - 1795).cast("long")
            .as("cx"),
          (((col("n_nationkey") * 23) % 160) * 10 - 795).cast("long")
            .as("cy"),
          (lit(40) + (col("n_nationkey") % 4) * 15).cast("long").as("s"))
        .select(col("n_nationkey"), array(hx.map { case (ox, oy) =>
          struct((col("cx") + lit(ox) * col("s")).as("x"),
            (col("cy") + lit(oy) * col("s")).as("y"))
        }: _*).as("verts"))
      graft.operators.Spatial
        .pointInPolygonJoin(pts, "px", "py", polys, "verts")
        .select(col("c_custkey"), col("n_nationkey"))
        .orderBy(col("c_custkey"), col("n_nationkey"))
    },

    // Grid radius join (the 2-D sibling of e09's binned interval join):
    // every customer within 1000 km of some nation centroid, joined on
    // 5° grid cells (sites replicated to their radius bounding box,
    // points to their one cell, antimeridian wrap via modular lon bins)
    // before the exact rounded-haversine residual. The oracle runs the
    // naive cross-join filter — the grid is a pure plan rewrite.
    // G10 map-matching (J5/J6 composed into the classic transit
    // analytics op): snap every GPS point of every trace to its nearest
    // route polyline, then attribute each trace to the route most of
    // its points snapped to. Routes = 5 bounded supplier polylines (a
    // driver-held constant — the codebook doctrine; routes with < 2
    // points carry no segments and are excluded on BOTH sides); the
    // per-point nearest-route argmin is a pure row expression (one
    // native ProjectToLine kernel call per candidate route, distance
    // rounded to whole meters BEFORE the argmin, route-id tiebreak), so
    // the corpus never joins — two map-side-combinable vote aggregates
    // finish the attribution. At 100 TB: polylines broadcast-ship in
    // codegen, one corpus pass + two key-bounded exchanges.
    "g10_map_match" -> { (s, dir) =>
      val t = Tables(s, dir)
      val wr = Window.partitionBy(col("route")).orderBy(col("s_suppkey"))
      val routeRows = t.supplier
        .select((col("s_nationkey") % 5).cast("int").as("route"),
          col("s_suppkey"), suppLon.as("lon"), suppLat.as("lat"))
        .withColumn("rn", row_number().over(wr))
        .filter(col("rn") <= G10MaxPts)
        .select(col("route"), col("rn"), col("lon"), col("lat"))
        .collect()
      val routes: Seq[(Int, Seq[Seq[Double]])] = routeRows
        .groupBy(_.getInt(0))
        .map { case (rid, rows) =>
          rid -> rows.sortBy(_.getInt(1))
            .map(r => Seq(r.getDouble(2), r.getDouble(3))).toSeq
        }
        .filter(_._2.size >= 2)
        .toSeq.sortBy(_._1)
      // one fused native kernel call per row (plans/MapMatch) instead of
      // |routes| composed ProjectToLine + array_min chains — same exact
      // semantics (MapMatchSpec parity)
      val pts0 = t.lineitem
        .select(col("l_orderkey").as("trace"), array(liLon, liLat).as("p"))
      // single-row-group scans run per-row-heavy kernels one-wide;
      // widen only when pathologically narrow (no-op on multi-file
      // data — graft.Graft.kernelParallel has the measured history)
      val pts = graft.Graft.kernelParallel(pts0)
      pts
        .select(col("trace"),
          graft.plans.MapMatch.mapMatch(col("p"), routes)
            .getField("r").as("route"))
        .groupBy(col("trace"), col("route"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("trace"))
        .agg(min(struct((-col("n")).as("nn"), col("route").as("r"))).as("m"))
        .select(col("trace"), col("m.r").as("route"))
        .groupBy(col("route"))
        .agg(count(lit(1)).as("n_traces"),
          sum(col("trace") % 9973).as("trace_checksum"))
        .orderBy(col("route"))
    },

    "g06_grid_radius_join" -> { (s, dir) =>
      val t = Tables(s, dir)
      val pts = t.customer.select(col("c_custkey"),
        custLon.as("lon"), custLat.as("lat"))
      val sites = t.nation.select(col("n_nationkey"),
        natLon.as("cl"), natLat.as("ct"))
      graft.operators.Spatial.gridRadiusJoin(
          pts, "lon", "lat", sites, "cl", "ct",
          radiusKm = 1000.0, cellDeg = 5.0)
        .select(col("c_custkey"), col("n_nationkey"), col("dist_km"))
        .orderBy(col("c_custkey"), col("n_nationkey"))
    }
  )

  def oracle: Map[String, String] = Map(
    "g01_haversine_to_hub" ->
      s"""SELECT c_custkey,
         | round(${havKmSql(custLonSql, custLatSql, "CAST(107.6 AS DOUBLE)", "CAST(-6.9 AS DOUBLE)")}, 4) AS dist_km
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "g02_cumulative_track_dist" ->
      s"""WITH pts AS (
         | SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |  $liLonSql AS lon, $liLatSql AS lat
         | FROM lineitem),
         |seg AS (
         | SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |  CAST(coalesce(round(${havKmSql(
             "lag(lon) OVER w", "lag(lat) OVER w", "lon", "lat")} * 1000), 0.0)
         |    AS BIGINT) AS seg_mkm
         | FROM pts
         | WINDOW w AS (PARTITION BY l_orderkey
         |              ORDER BY l_linenumber, l_partkey, l_suppkey))
         |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         | CAST(SUM(seg_mkm) OVER (PARTITION BY l_orderkey
         |   ORDER BY l_linenumber, l_partkey, l_suppkey
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/1000
         |   AS cum_km
         |FROM seg ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,

    "g03_nearest_centroid" ->
      s"""WITH pts AS (
         | SELECT c_custkey, $custLonSql AS lon, $custLatSql AS lat FROM customer),
         |cents AS (
         | SELECT n_nationkey, $natLonSql AS cl, $natLatSql AS ct FROM nation),
         |d AS (
         | SELECT c_custkey, n_nationkey,
         |  ${havKmSql("lon", "lat", "cl", "ct")} AS dkm,
         |  round(${havKmSql("lon", "lat", "cl", "ct")}, 6) AS d6
         | FROM pts CROSS JOIN cents),
         |r AS (
         | SELECT *, row_number() OVER (PARTITION BY c_custkey
         |    ORDER BY d6, n_nationkey) AS rn FROM d)
         |SELECT c_custkey, n_nationkey AS nearest_key, round(dkm, 1) AS dist_km
         |FROM r WHERE rn = 1 ORDER BY c_custkey""".stripMargin,

    "g04_time_codec_roundtrip" ->
      """WITH b AS (SELECT o_orderkey, o_orderkey % 100000 AS secs FROM orders),
        |f AS (SELECT o_orderkey, secs,
        |  printf('%02d:%02d:%02d', secs // 3600, (secs % 3600) // 60, secs % 60) AS hhmmss
        | FROM b)
        |SELECT o_orderkey, secs, hhmmss,
        | CASE WHEN regexp_matches(hhmmss, '^\d+:\d{2}(:\d{2})?$')
        |  THEN CAST(string_split(hhmmss, ':')[1] AS INT) * 3600
        |     + CAST(string_split(hhmmss, ':')[2] AS INT) * 60
        |     + coalesce(CAST(string_split(hhmmss, ':')[3] AS INT), 0)
        |  ELSE 0 END AS secs_back,
        | 0 AS junk_parsed
        |FROM f ORDER BY o_orderkey""".stripMargin,

    "g05_interpolated_points" ->
      s"""WITH pts AS (
         | SELECT c_nationkey, c_custkey,
         |  $custLonSql AS lon, $custLatSql AS lat FROM customer),
         |lagged AS (
         | SELECT c_nationkey, c_custkey, lon, lat,
         |  lag(lon) OVER w AS plon, lag(lat) OVER w AS plat
         | FROM pts WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_custkey)),
         |seg AS (
         | SELECT *, round(${havKmSql("plon", "plat", "lon", "lat")}, 4) AS d4
         | FROM lagged WHERE plon IS NOT NULL),
         |n_seg AS (
         | SELECT *, CAST(least(floor(d4 / 2000.0), 4.0) AS INT) AS n
         | FROM seg WHERE d4 >= 2000.0)
         |SELECT c_nationkey, c_custkey, CAST(r.range AS INT) AS i,
         | round(plon + (lon - plon) * (CAST(r.range AS DOUBLE) / (n + 1)), 6) AS lon_i,
         | round(plat + (lat - plat) * (CAST(r.range AS DOUBLE) / (n + 1)), 6) AS lat_i
         |FROM n_seg JOIN range(1, 5) r ON r.range <= n
         |ORDER BY c_nationkey, c_custkey, i""".stripMargin,

    // the decimation walk replayed row-at-a-time, carrying last-kept
    // coordinates (e03's recursion pattern with haversine as the gap)
    "g07_radial_simplify" -> {
      val hav = havKmSql("w.klon", "w.klat", "p.lon", "p.lat")
      s"""WITH RECURSIVE p AS (
         |  SELECT l_orderkey AS trk,
         |    l_linenumber*10000000000 + l_partkey*100000 + l_suppkey AS seq,
         |    $liLonSql AS lon, $liLatSql AS lat,
         |    row_number() OVER (PARTITION BY l_orderkey
         |      ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
         |  FROM lineitem),
         |walk(trk, rn, seq, lon, lat, klon, klat, kept) AS (
         |  SELECT trk, rn, seq, lon, lat, lon, lat, true FROM p WHERE rn = 1
         |  UNION ALL
         |  SELECT p.trk, p.rn, p.seq, p.lon, p.lat,
         |    CASE WHEN round($hav, 4) >= 5000
         |         THEN p.lon ELSE w.klon END,
         |    CASE WHEN round($hav, 4) >= 5000
         |         THEN p.lat ELSE w.klat END,
         |    round($hav, 4) >= 5000
         |  FROM walk w JOIN p ON p.trk = w.trk AND p.rn = w.rn + 1)
         |SELECT trk AS l_orderkey, seq, lon, lat FROM walk WHERE kept
         |ORDER BY l_orderkey, seq""".stripMargin
    },

    // the same anchor walk carrying the anchor's seq, rolled up per run
    "g09_stay_points" -> {
      val hav = havKmSql("w.klon", "w.klat", "p.lon", "p.lat")
      s"""WITH RECURSIVE p AS (
         |  SELECT l_orderkey AS trk,
         |    l_linenumber*10000000000 + l_partkey*100000 + l_suppkey AS seq,
         |    $liLonSql AS lon, $liLatSql AS lat,
         |    row_number() OVER (PARTITION BY l_orderkey
         |      ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
         |  FROM lineitem),
         |walk(trk, rn, seq, lon, lat, kseq, klon, klat) AS (
         |  SELECT trk, rn, seq, lon, lat, seq, lon, lat FROM p WHERE rn = 1
         |  UNION ALL
         |  SELECT p.trk, p.rn, p.seq, p.lon, p.lat,
         |    CASE WHEN round($hav, 4) >= 5000
         |         THEN p.seq ELSE w.kseq END,
         |    CASE WHEN round($hav, 4) >= 5000
         |         THEN p.lon ELSE w.klon END,
         |    CASE WHEN round($hav, 4) >= 5000
         |         THEN p.lat ELSE w.klat END
         |  FROM walk w JOIN p ON p.trk = w.trk AND p.rn = w.rn + 1)
         |SELECT trk AS l_orderkey, kseq AS anchor_seq,
         |  round(klon, 4) AS anchor_lon, round(klat, 4) AS anchor_lat,
         |  COUNT(*) AS n_pts
         |FROM walk GROUP BY 1, 2, 3, 4 HAVING COUNT(*) >= 3
         |ORDER BY l_orderkey, anchor_seq""".stripMargin
    },

    // the whole match replayed: segment table from the same capped
    // supplier polylines, exact projection/clamp math per (point, seg),
    // per-route MIN of the raw distance, meter-rounded argmin with the
    // route tiebreak, then the two vote rollups. The per-point best
    // depends only on the coords, so it is computed per DISTINCT
    // (px, py) and joined back — identical multiset to Spark's per-row
    // evaluation.
    "g10_map_match" -> {
      val dxy = "(s.x2 - s.x1)"
      val dyy = "(s.y2 - s.y1)"
      val lenSq = s"($dxy*$dxy + $dyy*$dyy)"
      val t = s"LEAST(GREATEST(((p.px - s.x1)*$dxy + (p.py - s.y1)*$dyy) / $lenSq, 0), 1)"
      val projx = s"(s.x1 + $t*$dxy)"
      val projy = s"(s.y1 + $t*$dyy)"
      s"""WITH sp AS (
         | SELECT CAST(s_nationkey % 5 AS INT) AS route, s_suppkey,
         |  $suppLonSql AS lon, $suppLatSql AS lat,
         |  row_number() OVER (PARTITION BY s_nationkey % 5
         |                     ORDER BY s_suppkey) AS rn
         | FROM supplier),
         |pl AS (SELECT * FROM sp WHERE rn <= $G10MaxPts),
         |segs AS (
         | SELECT a.route, a.lon AS x1, a.lat AS y1, b.lon AS x2, b.lat AS y2
         | FROM pl a JOIN pl b ON b.route = a.route AND b.rn = a.rn + 1),
         |pts AS (
         | SELECT l_orderkey AS trace, $liLonSql AS px, $liLatSql AS py
         | FROM lineitem),
         |d AS (
         | SELECT p.px, p.py, s.route,
         |  CASE WHEN $lenSq = 0
         |       THEN ${havMSql("p.px", "p.py", "s.x1", "s.y1")}
         |       ELSE ${havMSql("p.px", "p.py", projx, projy)} END AS dm
         | FROM (SELECT DISTINCT px, py FROM pts) p CROSS JOIN segs s),
         |perroute AS (
         | SELECT px, py, route, CAST(round(MIN(dm)) AS BIGINT) AS d_m
         | FROM d GROUP BY px, py, route),
         |bp AS (
         | SELECT px, py, route FROM (
         |  SELECT *, row_number() OVER (PARTITION BY px, py
         |                               ORDER BY d_m, route) AS rn
         |  FROM perroute) WHERE rn = 1),
         |votes AS (
         | SELECT p.trace, b.route, COUNT(*) AS n
         | FROM pts p JOIN bp b ON p.px = b.px AND p.py = b.py
         | GROUP BY p.trace, b.route),
         |m AS (
         | SELECT trace, route,
         |  row_number() OVER (PARTITION BY trace
         |                     ORDER BY n DESC, route) AS rn
         | FROM votes)
         |SELECT route, COUNT(*) AS n_traces,
         | CAST(SUM(trace % 9973) AS BIGINT) AS trace_checksum
         |FROM m WHERE rn = 1 GROUP BY route ORDER BY route""".stripMargin
    },

    // the naive cross-join radius filter the engine's grid join must equal
    "g06_grid_radius_join" ->
      s"""WITH p AS (SELECT c_custkey, $custLonSql AS lon, $custLatSql AS lat
         |           FROM customer),
         |s AS (SELECT n_nationkey, $natLonSql AS cl, $natLatSql AS ct
         |      FROM nation)
         |SELECT c_custkey, n_nationkey,
         | round(${havKmSql("lon", "lat", "cl", "ct")}, 4) AS dist_km
         |FROM p, s
         |WHERE round(${havKmSql("lon", "lat", "cl", "ct")}, 4) <= 1000
         |ORDER BY c_custkey, n_nationkey""".stripMargin,

    // definitional crossing-number: unnest the 6 directed hexagon
    // edges, sum the integer-exact ray-crossing indicator, odd = inside
    "g08_point_in_polygon" -> {
      val ox = PolyOffX.mkString("[", ", ", "]")
      val oy = PolyOffY.mkString("[", ", ", "]")
      s"""WITH poly AS (
         |  SELECT n_nationkey,
         |    CAST((n_nationkey*37) % 360 AS BIGINT)*10 - 1795 AS cx,
         |    CAST((n_nationkey*23) % 160 AS BIGINT)*10 - 795 AS cy,
         |    CAST(40 + (n_nationkey % 4)*15 AS BIGINT) AS s
         |  FROM nation),
         |e AS (
         |  SELECT n_nationkey,
         |    cx + $ox[i]*s AS x1, cy + $oy[i]*s AS y1,
         |    cx + $ox[(i % 6) + 1]*s AS x2, cy + $oy[(i % 6) + 1]*s AS y2
         |  FROM poly, unnest(generate_series(1, 6)) t(i)),
         |pts AS (
         |  SELECT c_custkey,
         |    CAST(c_custkey % 3600 AS BIGINT) - 1800 AS px,
         |    CAST((c_custkey*7) % 1700 AS BIGINT) - 850 AS py
         |  FROM customer)
         |SELECT c_custkey, n_nationkey
         |FROM pts p, e
         |GROUP BY c_custkey, n_nationkey
         |HAVING SUM(CASE
         |  WHEN y1 <= py AND y2 > py
         |   AND (px - x1)*(y2 - y1) < (x2 - x1)*(py - y1) THEN 1
         |  WHEN y1 > py AND y2 <= py
         |   AND (px - x1)*(y2 - y1) > (x2 - x1)*(py - y1) THEN 1
         |  ELSE 0 END) % 2 = 1
         |ORDER BY c_custkey, n_nationkey""".stripMargin
    }
  )
}
