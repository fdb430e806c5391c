package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed radius (within-distance) spatial join — the 2-D sibling of
  * [[Intervals]]' grid method: "every point within R km of some site".
  * The naive form is a cross join + haversine filter, O(P·S) with no
  * partitioning — fine for a broadcast-sized site table (g03's shape),
  * a cliff when both sides are large.
  *
  * Grid method: tile the globe into `cellDeg`-degree lat/lon cells. Each
  * SITE is replicated to every cell its radius bounding box touches
  * (conservative box: Δlat = R/111.195 km-per-degree; Δlon = Δlat /
  * cos(nearest-to-pole latitude of the box), clamped — the box may
  * OVERSHOOT the circle, never undershoot, so candidate generation can
  * only over-produce and the exact haversine residual decides
  * membership). Each POINT maps to its ONE cell. Longitude bins wrap
  * modulo 360/cellDeg so an antimeridian-crossing box replicates onto
  * both sides; points materialize a pair at most once per site because
  * the point's bin is unique. The join becomes a plain equi-join on
  * (latBin, lonBin): shuffle-partitionable, AQE-skew-splittable, cost
  * O(P + S·⌈box/cell⌉²) candidates instead of O(P·S).
  *
  * Float discipline: trig only shapes the CANDIDATE boxes (conservative,
  * engine-local); the membership predicate is `round(haversineKm, 4) ≤
  * R` — the suite's cross-engine rounding convention — so results
  * hash-match any engine running the naive join.
  */
object Spatial {

  private val KmPerDeg = 111.195 // mean earth: 2πR/360, R=6371 km

  /** Inner-join each point to every site within `radiusKm` (half-open by
    * rounding: round(d,4) ≤ R). Output: all point columns + all site
    * columns + `dist_km` (rounded 4 dp).
    *
    * @param cellDeg grid cell size in degrees; tune toward the typical
    *                radius in degrees (fan-out ⌈2·R°/cell⌉² per site).
    */
  def gridRadiusJoin(points: DataFrame, lonP: String, latP: String,
                     sites: DataFrame, lonS: String, latS: String,
                     radiusKm: Double, cellDeg: Double): DataFrame = {
    require(radiusKm > 0, s"radiusKm must be positive, got $radiusKm")
    require(cellDeg > 0 && 360 % cellDeg == 0,
      s"cellDeg must divide 360, got $cellDeg")
    val lonBins = math.round(360 / cellDeg)
    def latBin(c: Column) = floor(c / cellDeg).cast("long")
    def lonBin(c: Column) = pmod(floor(c / cellDeg).cast("long"), lit(lonBins))
    val dLat = radiusKm / KmPerDeg
    // widest |lat| the box reaches decides the lon stretch; clamp below
    // 89.99° so cos never hits 0 (a near-polar box just spans all bins)
    val edgeLat = least(greatest(abs(col(latS)) + dLat, lit(0.0)), lit(89.99))
    val dLon = least(lit(dLat) / cos(radians(edgeLat)), lit(180.0))
    // lon bins enumerated UNWRAPPED (so a box crossing ±180° lands on
    // both sides after pmod) but clamped to one full circle — without
    // the clamp a near-polar box would enumerate the same wrapped bin
    // twice and duplicate pairs (dedup-by-distinct would instead
    // collapse legitimately duplicated site rows).
    val lonLo = floor((col(lonS) - dLon) / cellDeg).cast("long")
    val lonHi = least(floor((col(lonS) + dLon) / cellDeg).cast("long"),
      lonLo + (lonBins - 1))
    val s2 = sites
      .withColumn("__latb", explode(sequence(
        latBin(col(latS) - dLat), latBin(col(latS) + dLat))))
      .withColumn("__lonb", explode(sequence(lonLo, lonHi)))
      .withColumn("__lonb", pmod(col("__lonb"), lit(lonBins)))
    val p2 = points
      .withColumn("__latb", latBin(col(latP)))
      .withColumn("__lonb", lonBin(col(lonP)))
    p2.join(s2, Seq("__latb", "__lonb"))
      .withColumn("dist_km", round(graft.functions.geo.haversineKm(
        col(lonP), col(latP), col(lonS), col(latS)), 4))
      .filter(col("dist_km") <= radiusKm)
      .drop("__latb", "__lonb")
  }

  /** Point-in-polygon join: every (point, polygon) pair where the point
    * lies inside the polygon — the geofence / admin-region tagging
    * primitive. Membership is the crossing-number test (count edges a
    * rightward ray from the point crosses; odd = inside), evaluated in
    * EXACT INTEGER arithmetic: coordinates are integers (e.g.
    * deci-degrees), the "ray crosses edge" predicate is the
    * cross-multiplied form of `px < x1 + (x2−x1)(py−y1)/(y2−y1)` with
    * the inequality direction carried by the edge's y-orientation, so
    * no division, no floats, bit-identical on every engine. The
    * half-open rule (lower endpoint in, upper out) means shared
    * vertices and horizontal edges are counted exactly once — the
    * standard simulation-of-simplicity convention.
    *
    * Scale shape: the polygon side is dimension-scale (regions,
    * geofences — bounded), so candidates come from a BROADCAST
    * bounding-box join (each point tests only polygons whose bbox
    * contains it; the O(rows) side never shuffles), and the exact test
    * is a per-row codegen fold over the vertex array — O(edges) per
    * candidate, no explode, nothing leaves the row. For a polygon set
    * too big to broadcast, tile bboxes to grid cells and equi-join on
    * the cell key ([[gridRadiusJoin]]'s method) before the same fold.
    *
    * `vertsCol`: array of {x,y} integer structs, in boundary order
    * (either winding), implicitly closed (last→first edge), no repeated
    * closing vertex. Output: all point columns + all polygon columns,
    * candidates filtered to members.
    */
  def pointInPolygonJoin(points: DataFrame, xCol: String, yCol: String,
                         polys: DataFrame, vertsCol: String): DataFrame = {
    val v = col(vertsCol)
    def vx(p: Column) = p.getField("x")
    def vy(p: Column) = p.getField("y")
    val bboxed = polys
      .withColumn("__xmin", array_min(transform(v, vx(_))))
      .withColumn("__xmax", array_max(transform(v, vx(_))))
      .withColumn("__ymin", array_min(transform(v, vy(_))))
      .withColumn("__ymax", array_max(transform(v, vy(_))))
    val px = col(xCol)
    val py = col(yCol)
    // the membership test is the native codegen kernel, NOT a HOF fold:
    // the optimizer merges this filter into the broadcast join's
    // condition, where an interpreted fold as the first conjunct ran on
    // every (point × polygon) pair before the bbox conjuncts could
    // prune (graft.plans.PointInPolygon doc; measured 1.74 s → bbox
    // cost at sf0.1)
    points.join(broadcast(bboxed),
        px >= col("__xmin") && px <= col("__xmax") &&
          py >= col("__ymin") && py <= col("__ymax"))
      .filter(graft.plans.PointInPolygon.pointInPolygon(px, py, v))
      .drop("__xmin", "__xmax", "__ymin", "__ymax")
  }

  /** The HOF fold [[pointInPolygonJoin]]'s kernel replaced — kept
    * (test-only) as the parity oracle for the PointInPolygon kernel
    * (SpatialSpec), the IvfCell pattern.
    */
  private[graft] def crossingsHof(px: Column, py: Column,
                                  v: Column): Column = {
    def vx(p: Column) = p.getField("x")
    def vy(p: Column) = p.getField("y")
    val cnt = aggregate(
      transform(v, (p, i) => {
        val q = element_at(v, pmod(i + 1, size(v)) + 1)
        val lhs = (px - vx(p)) * (vy(q) - vy(p))
        val rhs = (vx(q) - vx(p)) * (py - vy(p))
        when(vy(p) <= py && vy(q) > py && lhs < rhs, 1)
          .when(vy(p) > py && vy(q) <= py && lhs > rhs, 1)
          .otherwise(0)
      }),
      lit(0), (acc, x) => acc + x)
    cnt % 2 === 1
  }
}
