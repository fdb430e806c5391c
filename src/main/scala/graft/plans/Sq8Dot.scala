package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column

/** Int8 scalar-quantization dot product (the SQ8 of FAISS/vector DBs) as a
  * native codegen expression: each component of the input `array<double>`
  * vector is quantized to `round(x·127/scale)` — an integer in [-127,127]
  * when `scale` bounds the corpus max |x| — and dotted against the
  * pre-quantized query codes in exact long arithmetic. One fused per-row
  * pass: nothing is materialized, no join, no shuffle; at 100 TB the same
  * kernel runs over a stored int8 codes table at ¼ the vector bytes.
  *
  * Determinism: rounding is half-AWAY-FROM-ZERO on the binary double
  * (C/DuckDB `round` semantics — NOT Spark's `round`, which is HALF_UP on
  * the shortest decimal repr, and NOT `rint`'s half-even), so the score is
  * bit-identical to the DuckDB mirror on any engine/partitioning; the
  * integer dot itself is order-free exact.
  *
  * Null input → null; a vector whose length differs from the query's →
  * null (no meaningful score exists).
  */
case class Sq8Dot(child: Expression, qCodes: Seq[Int], scale: Double)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"sq8_dot expects array<double>, got ${dt.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "sq8_dot"
  override def nullable: Boolean = true

  @transient private lazy val kernel: Sq8Dot.Kernel =
    Sq8Dot.Kernel(qCodes.toArray, scale)

  override protected def nullSafeEval(v: Any): Any =
    kernel.dot(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sq8Kernel", kernel, "graft.plans.Sq8Dot.Kernel")
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("sq8r")
      s"""java.lang.Long $r = $ref.dot($v);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Sq8Dot =
    copy(child = newChild)
}

object Sq8Dot {

  final case class Kernel(qCodes: Array[Int], scale: Double) {
    require(scale > 0 && qCodes.nonEmpty)

    /** Boxed so codegen can signal the length-mismatch null. */
    def dot(v: ArrayData): java.lang.Long = {
      if (v.numElements() != qCodes.length) return null
      var acc = 0L
      var i = 0
      while (i < qCodes.length) {
        acc += roundHalfAway(v.getDouble(i) * 127.0 / scale) * qCodes(i)
        i += 1
      }
      acc
    }
  }

  /** C/DuckDB `round`: half away from zero on the binary double. The
    * fractional part `|x| - floor(|x|)` is exact for |x| < 2^52, so the
    * ≥ 0.5 test can't be perturbed by the addition that makes
    * `floor(x + 0.5)` wrong at e.g. 0.49999999999999994.
    */
  def roundHalfAway(x: Double): Long = {
    val ax = math.abs(x)
    val f = math.floor(ax)
    val r = if (ax - f >= 0.5) f + 1.0 else f
    (if (x < 0) -r else r).toLong
  }

  def sq8Dot(vec: Column, qCodes: Seq[Int], scale: Double): Column =
    org.apache.spark.sql.GraftBridge.column(
      Sq8Dot(org.apache.spark.sql.GraftBridge.expression(vec), qCodes, scale))
}
