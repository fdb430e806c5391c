package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column

/** g10's per-point nearest-route argmin as ONE native expression:
  * `map_match(point)` over a constructor-captured panel of route
  * polylines — point `array<double>` [lon, lat] → `struct<d: bigint,
  * r: int>` (distance to the winning route's nearest projection in
  * whole meters, winning route id).
  *
  * Semantics are EXACTLY the composed form it replaces (one
  * [[ProjectToLine]] call per route + Spark `round(…).cast("bigint")` +
  * `array_min` over `struct(d, r)`), pinned by MapMatchSpec parity:
  * per-route minimum over segments compares RAW doubles (strict-less,
  * first segment wins ties — value-identical either way), the raw
  * minimum is rounded to whole meters with Spark `round` semantics
  * (BigDecimal HALF_UP on the shortest decimal repr — NOT Math.round),
  * and the cross-route argmin orders by (rounded meters, route id).
  *
  * Why not the composed form: m ProjectToLine calls each re-unpack the
  * point and walk an ArrayData-of-ArrayData polyline literal —
  * per-segment `getArray` allocation dominates the trig (measured:
  * g10 8.28 s composed at sf0.1). Here the polylines live as plain
  * double arrays captured at construction (a bounded driver constant —
  * the codebook doctrine, same shipping pattern as [[PqEncode]]), and
  * one call scans them all.
  */
case class MapMatch(child: Expression, routeIds: Seq[Int],
                    polylines: Seq[Seq[Seq[Double]]])
  extends UnaryExpression {

  require(routeIds.nonEmpty && routeIds.size == polylines.size,
    "map_match needs one id per polyline, at least one route")
  require(polylines.forall(_.size >= 2),
    "map_match polylines need >= 2 points (no segments otherwise)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"map_match expects array<double>, got ${dt.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("d", LongType, nullable = false),
    StructField("r", IntegerType, nullable = false)))

  override def prettyName: String = "map_match"

  @transient private lazy val table: MapMatch.Routes = MapMatch.Routes(
    routeIds.toArray,
    polylines.map(l => l.map(_(0)).toArray).toArray,
    polylines.map(l => l.map(_(1)).toArray).toArray)

  override protected def nullSafeEval(point: Any): Any =
    table.best(point.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mapMatchRoutes", table,
      "graft.plans.MapMatch.Routes")
    nullSafeCodeGen(ctx, ev, p =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.best($p);")
  }

  override protected def withNewChildInternal(newChild: Expression): MapMatch =
    copy(child = newChild)
}

object MapMatch {

  /** Precompiled route panel: per route, the polyline's lon/lat as flat
    * double arrays.
    */
  case class Routes(ids: Array[Int], xs: Array[Array[Double]],
                    ys: Array[Array[Double]]) {

    /** Spark `round(x).cast("bigint")`: HALF_UP on the shortest decimal
      * repr (the [[PqEncode.roundE6]] doctrine at meter quantum).
      */
    private def sparkRound(x: Double): Long = new java.math.BigDecimal(
      java.lang.Double.toString(x))
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

    def best(point: ArrayData): InternalRow = {
      val px = point.getDouble(0)
      val py = point.getDouble(1)
      var bestD = Long.MaxValue
      var bestR = Int.MaxValue
      var r = 0
      while (r < ids.length) {
        val x = xs(r); val y = ys(r)
        var minDist = Double.PositiveInfinity
        var i = 0
        while (i < x.length - 1) {
          val x1 = x(i); val y1 = y(i)
          val dx = x(i + 1) - x1
          val dy = y(i + 1) - y1
          val lenSq = dx * dx + dy * dy
          val d =
            if (lenSq == 0)
              graft.extract.GeoKernels.haversineM((px, py), (x1, y1))
            else {
              var t = ((px - x1) * dx + (py - y1) * dy) / lenSq
              t = math.max(0, math.min(1, t))
              graft.extract.GeoKernels
                .haversineM((px, py), (x1 + t * dx, y1 + t * dy))
            }
          if (d < minDist) minDist = d
          i += 1
        }
        val dm = sparkRound(minDist)
        if (dm < bestD || (dm == bestD && ids(r) < bestR)) {
          bestD = dm; bestR = ids(r)
        }
        r += 1
      }
      InternalRow(bestD, bestR)
    }
  }

  /** Column-API entry point; `routes` = (id, polyline[lon, lat]). */
  def mapMatch(point: Column, routes: Seq[(Int, Seq[Seq[Double]])]): Column =
    org.apache.spark.sql.GraftBridge.column(
      MapMatch(org.apache.spark.sql.GraftBridge.expression(point),
        routes.map(_._1), routes.map(_._2)))
}
