package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geodesic + interpolation kernels (SURVEY.md §2.4 X1/X13/X14).
  *
  * Pure `Column` compositions of built-ins — no UDFs — so every use stays
  * inside whole-stage codegen and is safe at any scale.
  *
  * Reference semantics: haversine with R=6371 km (generate_gtfs.py:18-24)
  * and R=6371e3 m (update-routes.js:188-203); linear point interpolation at
  * fraction t (update-routes.js:304-307); 1e-6 coordinate tolerance
  * (update-routes.js:106-108).
  */
object geo {
  val EarthRadiusKm: Double = 6371.0
  val EarthRadiusM: Double  = 6371000.0

  /** Great-circle distance. Same formula shape as the reference:
    * 2·R·asin(√(sin²(Δlat/2) + cos(lat1)·cos(lat2)·sin²(Δlon/2))).
    */
  def haversine(lon1: Column, lat1: Column, lon2: Column, lat2: Column,
                radius: Double): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = sin(dLat) * sin(dLat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dLon) * sin(dLon)
    lit(2 * radius) * asin(sqrt(a))
  }

  def haversineKm(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column =
    haversine(lon1, lat1, lon2, lat2, EarthRadiusKm)

  def haversineM(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column =
    haversine(lon1, lat1, lon2, lat2, EarthRadiusM)

  /** X14: linear interpolation a + (b-a)·t. */
  def lerp(a: Column, b: Column, t: Column): Column = a + (b - a) * t

  /** X13: coordinate equality within tolerance (default 1e-6 as in the
    * reference way-stitching joint test).
    */
  def coordEq(a: Column, b: Column, tol: Double = 1e-6): Column =
    abs(a - b) < lit(tol)
}
