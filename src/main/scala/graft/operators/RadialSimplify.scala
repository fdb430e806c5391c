package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Radial-distance polyline simplification — the order-sensitive track
  * decimation GPS pipelines run before storage/rendering: walk each
  * track in sequence order, keep the first point, and keep a point only
  * if it is at least `tolKm` from the LAST KEPT point. The spatial
  * sibling of the W7 min-spacing sweep ([[Sessionize.minSpacingSweep]]):
  * the keep decision depends on the evolving kept-set, so no window
  * function expresses it — it is a sequential fold, and the oracle is a
  * row-at-a-time recursive CTE carrying the last-kept coordinates.
  *
  * Same scale shape as the sweep: hash-partition by track, spill-backed
  * partition sort on (track, seq), ONE streaming pass whose carried
  * state (last kept lon/lat) resets at track boundaries — no group is
  * ever materialized, so a billion-point track streams through.
  *
  * Float discipline: the JVM-side haversine reuses java.lang.Math —
  * the exact functions Spark's codegen'd trig expressions call — and
  * the keep test compares the 4-dp-rounded distance (the suite's
  * cross-engine rounding convention, g01/g03), so the fold is
  * bit-reproducible against a SQL replay.
  */
object RadialSimplify {

  /** Exact scalar twin of [[graft.functions.geo.haversineKm]]. */
  private[graft] def havKm(lon1: Double, lat1: Double,
                           lon2: Double, lat2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1) / 2
    val dLon = math.toRadians(lon2 - lon1) / 2
    val a = math.sin(dLat) * math.sin(dLat) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.sin(dLon) * math.sin(dLon)
    2 * 6371.0 * math.asin(math.sqrt(a))
  }

  /** Spark-round semantics (HALF_UP at 4 dp) for the keep threshold. */
  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Kept points of each track: (trackCol, seqCol, lonCol, latCol),
    * first point always kept, subsequent points kept iff
    * round(haversineKm(lastKept, p), 4) ≥ tolKm.
    */
  def radialSimplify(df: DataFrame, trackCol: String, seqCol: String,
                     lonCol: String, latCol: String,
                     tolKm: Double): DataFrame = {
    require(tolKm > 0, s"tolKm must be positive, got $tolKm")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(trackCol).cast("long"), col(seqCol).cast("long"),
        col(lonCol).cast("double"), col(latCol).cast("double"))
      .as[(Long, Long, Double, Double)]
      .repartition(col(trackCol))
      .sortWithinPartitions(col(trackCol), col(seqCol))
      .mapPartitions { it =>
        var curTrack = 0L
        var lastLon = 0.0
        var lastLat = 0.0
        var started = false
        it.filter { case (trk, _, lon, lat) =>
          if (!started || trk != curTrack) {
            started = true; curTrack = trk; lastLon = lon; lastLat = lat
            true
          } else if (r4(havKm(lastLon, lastLat, lon, lat)) >= tolKm) {
            lastLon = lon; lastLat = lat; true
          } else false
        }
      }
      .toDF(trackCol, seqCol, lonCol, latCol)
  }

  /** Stay-point detection — the complement of [[radialSimplify]]: where
    * the decimation KEEPS the points that moved, this reports where the
    * track LINGERED. A stay is a maximal run of consecutive points all
    * within `tolKm` of the run's ANCHOR (its first point — the same
    * last-kept-anchor walk as the simplify fold, so the two operators
    * partition every track identically); runs of at least `minPts`
    * points are reported as (track, anchor_seq, anchor lon/lat, n_pts).
    * The GPS dwell/visit extraction primitive (Li et al. 2008's
    * stay-point shape, distance-only form).
    *
    * Scale shape: the identical one-streaming-pass fold as
    * [[radialSimplify]] (partition by track, spill-backed sort, carried
    * anchor state) emitting each point's anchor, then one
    * map-side-combined rollup on (track, anchor) — run lengths
    * aggregate without any group materialization.
    */
  def stayPoints(df: DataFrame, trackCol: String, seqCol: String,
                 lonCol: String, latCol: String, tolKm: Double,
                 minPts: Int): DataFrame = {
    require(tolKm > 0, s"tolKm must be positive, got $tolKm")
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(trackCol).cast("long"), col(seqCol).cast("long"),
        col(lonCol).cast("double"), col(latCol).cast("double"))
      .as[(Long, Long, Double, Double)]
      .repartition(col(trackCol))
      .sortWithinPartitions(col(trackCol), col(seqCol))
      .mapPartitions { it =>
        var curTrack = 0L
        var aSeq = 0L
        var aLon = 0.0
        var aLat = 0.0
        var started = false
        it.map { case (trk, seq, lon, lat) =>
          if (!started || trk != curTrack ||
            r4(havKm(aLon, aLat, lon, lat)) >= tolKm) {
            started = true; curTrack = trk
            aSeq = seq; aLon = lon; aLat = lat
          }
          (trk, aSeq, aLon, aLat)
        }
      }
      .toDF(trackCol, "anchor_seq", "anchor_lon", "anchor_lat")
      .groupBy(col(trackCol), col("anchor_seq"), col("anchor_lon"),
        col("anchor_lat"))
      .agg(count(lit(1)).as("n_pts"))
      .filter(col("n_pts") >= minPts)
  }
}
