package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column

/** Cosine similarity of two `array<double>` columns as a native Catalyst
  * expression with whole-stage codegen — replaces the
  * `aggregate(zip_with(...))` higher-order pipeline, which Spark evaluates
  * interpreted (HOFs are CodegenFallback) at ~1 ms per pair on wide
  * vectors. FP operation order matches the HOF left fold exactly
  * (sequential accumulate, then dot/(|a|·|b|)), so results are
  * bit-identical to the previous implementation and to DuckDB's
  * list_dot_product oracle.
  */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isDoubles(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (isDoubles(left.dataType) && isDoubles(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<double>, got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  // mismatched-length inputs yield null even when both children are
  // non-null (matching the HOF pipeline, where zip_with's null padding
  // poisons the fold)
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else CosineSim.kernel(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.plans.CosineSim.kernel($a, $b);
         |}""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** Sequential left-fold dot/norms — same FP order as the HOF pipeline.
    * Callers guarantee equal lengths (the expression returns null for
    * mismatches before reaching the kernel).
    */
  def kernel(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosineSim(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      CosineSim(org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))
}
