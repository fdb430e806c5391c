package graft

import org.apache.spark.sql.functions._
import graft.plans.{MapMatch, ProjectToLine}

/** The fused map_match kernel pinned against the composed form it
  * replaced (one ProjectToLine per route + Spark round→bigint +
  * array_min over struct(d, r)) — exact equality on real-shaped data,
  * plus the contract edge cases.
  */
class MapMatchSpec extends SparkTestBase {

  private val routes: Seq[(Int, Seq[Seq[Double]])] = Seq(
    0 -> Seq(Seq(107.60, -6.90), Seq(107.65, -6.95), Seq(107.70, -6.91)),
    2 -> Seq(Seq(-107.60, 6.90), Seq(-107.61, 6.91)),
    // degenerate zero-length segment inside an otherwise fine polyline
    5 -> Seq(Seq(0.0, 0.0), Seq(0.0, 0.0), Seq(1.0, 1.0)),
    // a route near the antipode of route 0's area (exercises the
    // haversineM ulp clamp on near-antipodal projections)
    7 -> Seq(Seq(-72.40, 6.90), Seq(-72.35, 6.95)))

  private def composed = {
    val cand = routes.map { case (rid, line) =>
      struct(
        round(ProjectToLine.projectToLine(col("p"), typedLit(line))
          .getField("dist_m")).cast("bigint").as("d"),
        lit(rid).as("r"))
    }
    array_min(array(cand: _*))
  }

  test("fused kernel == composed ProjectToLine + round + array_min " +
    "on 2000 spread points") {
    import spark.implicits._
    val pts = (1 to 2000).map { i =>
      Seq((i * 31 % 3600) / 10.0 - 180, (i * 17 % 1700) / 10.0 - 85)
    }.toDF("p")
    val rows = pts.select(
        MapMatch.mapMatch(col("p"), routes).as("k"), composed.as("c"))
      .select(col("k.d"), col("k.r"), col("c.d"), col("c.r"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(2) && r.getInt(1) == r.getInt(3),
        s"kernel (${r.getLong(0)}, ${r.getInt(1)}) != " +
          s"composed (${r.getLong(2)}, ${r.getInt(3)})")
    }
  }

  test("route-id tiebreak: equal rounded distance picks the smaller id") {
    import spark.implicits._
    // two identical polylines under different ids — distances tie exactly
    val dup = Seq(9 -> routes.head._2, 3 -> routes.head._2)
    val got = Seq(Seq(107.62, -6.92)).toDF("p")
      .select(MapMatch.mapMatch(col("p"), dup).getField("r")).head().getInt(0)
    assert(got == 3)
  }

  test("constructor contracts: ids match polylines, >= 2 points each") {
    intercept[IllegalArgumentException] {
      MapMatch(null, Seq(1), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      MapMatch(null, Seq(1), Seq(Seq(Seq(0.0, 0.0))))
    }
  }
}
