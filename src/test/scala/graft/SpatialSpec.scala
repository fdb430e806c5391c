package graft

import org.apache.spark.sql.functions._
import graft.operators.Spatial

/** Grid radius join: parity with the naive cross-join filter on real
  * tables, antimeridian wrap, duplicate-site preservation, and the
  * no-duplicate-pair guarantee for wide (near-polar) boxes.
  */
class SpatialSpec extends SparkTestBase {
  import spark.implicits._

  private def naive(points: org.apache.spark.sql.DataFrame,
                    sites: org.apache.spark.sql.DataFrame,
                    r: Double) =
    points.crossJoin(sites)
      .withColumn("dist_km", round(graft.functions.geo.haversineKm(
        col("lon"), col("lat"), col("cl"), col("ct")), 4))
      .filter(col("dist_km") <= r)

  test("grid join equals the naive cross-join filter on real tables") {
    val t = Tables(spark, sfSmoke)
    val pts = t.customer.select(col("c_custkey").as("pid"),
      ((col("c_custkey") % 3600).cast("double") / 10 - 180).as("lon"),
      (((col("c_custkey") * 7) % 1700).cast("double") / 10 - 85).as("lat"))
    val sites = t.nation.select(col("n_nationkey").as("sid"),
      (((col("n_nationkey") * 37) % 360).cast("double") - 179.5).as("cl"),
      (((col("n_nationkey") * 23) % 160).cast("double") - 79.5).as("ct"))
    // cell much smaller than the radius → real multi-cell replication
    val got = Spatial.gridRadiusJoin(pts, "lon", "lat", sites, "cl", "ct",
        radiusKm = 1500.0, cellDeg = 4.0)
      .select("pid", "sid").as[(Long, Long)].collect().toSet
    val want = naive(pts, sites, 1500.0)
      .select("pid", "sid").as[(Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("antimeridian: a site at lon 179.8 finds a point at lon -179.9") {
    val pts = Seq((1L, -179.9, 10.0)).toDF("pid", "lon", "lat")
    val sites = Seq((7L, 179.8, 10.0)).toDF("sid", "cl", "ct")
    val out = Spatial.gridRadiusJoin(pts, "lon", "lat", sites, "cl", "ct",
      radiusKm = 200.0, cellDeg = 5.0)
    assert(out.count() == 1) // ~33 km apart across the wrap
  }

  test("duplicate site rows each produce their own pair (naive semantics)") {
    val pts = Seq((1L, 10.0, 10.0)).toDF("pid", "lon", "lat")
    val sites = Seq((7L, 10.1, 10.1), (7L, 10.1, 10.1))
      .toDF("sid", "cl", "ct")
    val out = Spatial.gridRadiusJoin(pts, "lon", "lat", sites, "cl", "ct",
      radiusKm = 100.0, cellDeg = 5.0)
    assert(out.count() == 2)
  }

  test("a near-polar site spans every lon bin without duplicating pairs") {
    val pts = Seq((1L, 10.0, 88.0), (2L, -170.0, 89.0))
      .toDF("pid", "lon", "lat")
    val sites = Seq((7L, 0.0, 89.5)).toDF("sid", "cl", "ct")
    val out = Spatial.gridRadiusJoin(pts, "lon", "lat", sites, "cl", "ct",
        radiusKm = 400.0, cellDeg = 5.0)
      .select("pid", "sid").as[(Long, Long)].collect().toSeq
    // point 2 is ~120 km from the site (both near the pole), point 1 is
    // ~220 km of latitude away — both inside 400 km, each exactly once
    assert(out.sorted == Seq((1L, 7L), (2L, 7L)))
  }

  test("pointInPolygonJoin: serial crossing-number parity on a grid, " +
    "concave polygon, half-open boundary rule") {
    // concave "arrow" polygon (notch at the right side) with integer
    // vertices; probe every point of a covering grid
    val verts = Seq((0L, 0L), (8L, 0L), (4L, 3L), (8L, 6L), (0L, 6L))
    val polys = Seq((1L, verts)).toDF("poly_id", "raw")
      .select(col("poly_id"), expr(
        "transform(raw, r -> struct(r._1 AS x, r._2 AS y))").as("verts"))
    val pts = (for (x <- -1L to 9L; y <- -1L to 7L) yield (x, y))
      .toDF("px", "py")
    val got = Spatial.pointInPolygonJoin(pts, "px", "py", polys, "verts")
      .select("px", "py").as[(Long, Long)].collect().toSet
    def serialInside(px: Long, py: Long): Boolean = {
      val n = verts.size
      var c = 0
      for (i <- 0 until n) {
        val (x1, y1) = verts(i); val (x2, y2) = verts((i + 1) % n)
        val lhs = (px - x1) * (y2 - y1); val rhs = (x2 - x1) * (py - y1)
        if ((y1 <= py && y2 > py && lhs < rhs) ||
          (y1 > py && y2 <= py && lhs > rhs)) c += 1
      }
      c % 2 == 1
    }
    val want = (for (x <- -1L to 9L; y <- -1L to 7L if serialInside(x, y))
      yield (x, y)).toSet
    assert(got == want)
    // the notch tip region (x between 5 and 7 at y=3) is OUTSIDE —
    // concavity is honored, a bbox test alone would get this wrong
    assert(!got.contains((6L, 3L)) && got.contains((3L, 3L)))
    // half-open: bottom edge in, top edge out (no double counting)
    assert(got.contains((2L, 0L)) && !got.contains((2L, 6L)))
  }

  test("PointInPolygon kernel equals the HOF fold on random polygons") {
    // random-walk star polygons (possibly self-intersecting — crossing
    // number is still well-defined and both forms must agree) over a
    // dense probe grid; also a triangle touching every boundary case
    val rnd = new scala.util.Random(42)
    val polys = (1L to 6L).map { id =>
      val n = 3 + rnd.nextInt(6)
      id -> (0 until n).map(_ =>
        (rnd.nextInt(21) - 10L, rnd.nextInt(21) - 10L))
    }
    val pdf = polys.toDF("poly_id", "raw")
      .select(col("poly_id"), expr(
        "transform(raw, r -> struct(r._1 AS x, r._2 AS y))").as("verts"))
    val pts = (for (x <- -11L to 11L; y <- -11L to 11L) yield (x, y))
      .toDF("px", "py")
    val both = pts.crossJoin(pdf).select(col("poly_id"), col("px"),
      col("py"),
      graft.plans.PointInPolygon
        .pointInPolygon(col("px"), col("py"), col("verts")).as("k"),
      Spatial.crossingsHof(col("px"), col("py"), col("verts")).as("h"))
    assert(both.filter(col("k") =!= col("h")).count() == 0)
    assert(both.filter(col("k")).count() > 0, "degenerate fixture")
  }

  test("pointInPolygonJoin plans a broadcast join, no shuffle on points") {
    val polys = Seq((1L, Seq((0L, 0L), (4L, 0L), (4L, 4L), (0L, 4L))))
      .toDF("poly_id", "raw")
      .select(col("poly_id"), expr(
        "transform(raw, r -> struct(r._1 AS x, r._2 AS y))").as("verts"))
    val pts = (1L to 100L).map(i => (i % 10, i / 10)).toDF("px", "py")
    val plan = Spatial.pointInPolygonJoin(pts, "px", "py", polys, "verts")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"polygon side not broadcast:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"point side shuffled:\n$plan")
  }
}
