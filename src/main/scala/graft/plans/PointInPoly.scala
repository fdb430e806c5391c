package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column

/** Exact integer point-in-polygon membership (crossing number, half-open
  * boundary rule) as a native codegen expression — the hot predicate of
  * [[graft.operators.Spatial.pointInPolygonJoin]].
  *
  * Why a kernel and not the `aggregate(transform(...))` HOF fold it
  * replaced: higher-order functions are CodegenFallback, and the
  * optimizer legally merges the membership filter INTO the broadcast
  * join's condition — where it ran as the FIRST conjunct, evaluating the
  * interpreted fold on every (point × polygon) pair BEFORE the cheap
  * bbox conjuncts could prune (measured 1.74 s solo at sf0.1; the
  * kernel form runs the same join at bbox-candidate cost). As generated
  * code the test is a tight long-arithmetic loop — conjunct order no
  * longer matters because the full test costs ~an edge-count of integer
  * multiplies.
  *
  * Semantics (identical to the HOF form, parity-pinned in SpatialSpec):
  * for each directed edge (x1,y1)→(x2,y2) of the implicitly-closed
  * vertex array, a rightward ray from (px,py) crosses iff the edge
  * spans py half-openly (y1 ≤ py < y2 or y2 ≤ py < y1) and the
  * cross-multiplied intersection test passes with the inequality
  * direction carried by the edge's y-orientation — exact long
  * arithmetic, no division, no floats. Odd crossings = inside.
  * Fewer than 3 vertices = outside. Null inputs → null.
  */
case class PointInPolygon(first: Expression, second: Expression,
                          third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, LongType, ArrayType(StructType(fields), _))
        if fields.length == 2 &&
          fields.forall(_.dataType == LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"point_in_polygon expects (bigint, bigint, " +
          s"array<struct<x:bigint,y:bigint>>), got " +
          s"(${a.sql}, ${b.sql}, ${c.sql})")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "point_in_polygon"
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable

  override protected def nullSafeEval(px: Any, py: Any, v: Any): Any =
    PointInPolygon.inside(px.asInstanceOf[Long], py.asInstanceOf[Long],
      v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (px, py, v) =>
      s"${ev.value} = graft.plans.PointInPolygon.inside($px, $py, $v);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PointInPolygon =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PointInPolygon {

  /** The crossing-number loop — shared by eval and generated code (one
    * generated CALL, so codegen size is independent of polygon size).
    */
  def inside(px: Long, py: Long, arr: ArrayData): Boolean = {
    val n = arr.numElements()
    if (n < 3) return false
    var cnt = 0
    var p = arr.getStruct(0, 2)
    var x1 = p.getLong(0)
    var y1 = p.getLong(1)
    var i = 1
    while (i <= n) {
      val q = arr.getStruct(i % n, 2)
      val x2 = q.getLong(0)
      val y2 = q.getLong(1)
      val lhs = (px - x1) * (y2 - y1)
      val rhs = (x2 - x1) * (py - y1)
      if ((y1 <= py && y2 > py && lhs < rhs) ||
        (y1 > py && y2 <= py && lhs > rhs)) cnt += 1
      x1 = x2
      y1 = y2
      i += 1
    }
    (cnt & 1) == 1
  }

  /** Column-API entry point. */
  def pointInPolygon(px: Column, py: Column, verts: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      PointInPolygon(org.apache.spark.sql.GraftBridge.expression(px),
        org.apache.spark.sql.GraftBridge.expression(py),
        org.apache.spark.sql.GraftBridge.expression(verts)))
}
