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
}
