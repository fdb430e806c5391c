package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions.{lit, struct}

/** J6 as a native Catalyst expression: `project_to_line(point, line)` —
  * point `array<double>` [lon, lat], line `array<array<double>>` — returns
  * `struct<frac_idx: double, dist_m: double>` (fractional segment index of
  * the nearest projection, haversine meters to it), with full whole-stage
  * codegen via a static kernel call (update-routes.js:206-246 semantics,
  * shared with graft.extract.GeoKernels).
  *
  * Why an Expression and not a UDF: no Scala-object serialization per row,
  * null handling is codegen'd, and the call inlines into the generated
  * stage alongside the surrounding operators — the preferred shape for a
  * hot geo kernel at scale (SURVEY §2.12).
  */
case class ProjectToLine(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def strip(dt: DataType): DataType = dt match {
      case ArrayType(e, _) => ArrayType(strip(e), containsNull = false)
      case o => o
    }
    val ok = strip(left.dataType) == ArrayType(DoubleType, containsNull = false) &&
      strip(right.dataType) ==
        ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"project_to_line expects (array<double>, array<array<double>>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("frac_idx", DoubleType, nullable = false),
    StructField("dist_m", DoubleType, nullable = false)))

  override def prettyName: String = "project_to_line"

  override protected def nullSafeEval(point: Any, line: Any): Any =
    ProjectToLine.kernel(point.asInstanceOf[ArrayData], line.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, l) =>
      s"${ev.value} = graft.plans.ProjectToLine.kernel($p, $l);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ProjectToLine =
    copy(left = newLeft, right = newRight)
}

object ProjectToLine {

  /** Static kernel shared by interpreted eval and generated code. */
  def kernel(point: ArrayData, line: ArrayData): InternalRow = {
    val px = point.getDouble(0)
    val py = point.getDouble(1)
    var minDist = Double.PositiveInfinity
    var minIndex = -1
    var minT = 0.0
    val n = line.numElements()
    var i = 0
    while (i < n - 1) {
      val p1 = line.getArray(i)
      val p2 = line.getArray(i + 1)
      val x1 = p1.getDouble(0); val y1 = p1.getDouble(1)
      val dx = p2.getDouble(0) - x1
      val dy = p2.getDouble(1) - y1
      val lenSq = dx * dx + dy * dy
      if (lenSq == 0) {
        val d = graft.extract.GeoKernels.haversineM((px, py), (x1, y1))
        if (d < minDist) { minDist = d; minIndex = i; minT = 0.0 }
      } else {
        var t = ((px - x1) * dx + (py - y1) * dy) / lenSq
        t = math.max(0, math.min(1, t))
        val d = graft.extract.GeoKernels
          .haversineM((px, py), (x1 + t * dx, y1 + t * dy))
        if (d < minDist) { minDist = d; minIndex = i; minT = t }
      }
      i += 1
    }
    InternalRow(minIndex + minT, minDist)
  }

  /** Column-API entry point. */
  def projectToLine(point: Column, line: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      ProjectToLine(org.apache.spark.sql.GraftBridge.expression(point),
        org.apache.spark.sql.GraftBridge.expression(line)))
}

// SQL registration for this and every other native kernel lives in
// graft.plans.GraftExtensions (its own file).
