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

/** SQ8 encode: quantize an `array<double>` vector to its `array<tinyint>`
  * codes — `round(x·127/scale)` per component, half away from zero (see
  * [[Sq8Dot]]). The write-side of the at-rest codes table; requires
  * `scale` ≥ the corpus max |x| so every code fits a signed byte.
  */
case class Sq8Encode(child: Expression, scale: Double)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"sq8_encode expects array<double>, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "sq8_encode"
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    Sq8Dot.encodeKernel(v.asInstanceOf[ArrayData], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  graft.plans.Sq8Dot.encodeKernel($v, $scale);""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Sq8Encode =
    copy(child = newChild)
}

/** The codes-only half of SQ8 search: exact integer dot of a STORED
  * `array<tinyint>` codes column against the pre-quantized query — no
  * vector math at all, the scan the at-rest codes table exists for
  * (v14: the table holds only (id, codes), ¼ the vector bytes).
  */
case class Sq8CodesDot(child: Expression, qCodes: Seq[Int])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"sq8_codes_dot expects array<tinyint>, got ${dt.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "sq8_codes_dot"
  override def nullable: Boolean = true

  @transient private lazy val kernel: Sq8Dot.CodesKernel =
    Sq8Dot.CodesKernel(qCodes.toArray)

  override protected def nullSafeEval(v: Any): Any =
    kernel.dot(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sq8cKernel", kernel,
      "graft.plans.Sq8Dot.CodesKernel")
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("sq8cr")
      s"""java.lang.Long $r = $ref.dot($v);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Sq8CodesDot =
    copy(child = newChild)
}

object Sq8Dot {

  final case class CodesKernel(qCodes: Array[Int]) {
    require(qCodes.nonEmpty)

    def dot(v: ArrayData): java.lang.Long = {
      if (v.numElements() != qCodes.length) return null
      var acc = 0L
      var i = 0
      while (i < qCodes.length) {
        acc += v.getByte(i).toLong * qCodes(i)
        i += 1
      }
      acc
    }
  }

  def sq8CodesDot(codes: Column, qCodes: Seq[Int]): Column =
    org.apache.spark.sql.GraftBridge.column(
      Sq8CodesDot(org.apache.spark.sql.GraftBridge.expression(codes), qCodes))

  /** Per-row SQ8 encode (see [[Sq8Encode]]); scale must bound max |x|. */
  def encodeKernel(v: ArrayData, scale: Double): ArrayData = {
    val n = v.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = roundHalfAway(v.getDouble(i) * 127.0 / scale).toByte
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def sq8Encode(vec: Column, scale: Double): Column =
    org.apache.spark.sql.GraftBridge.column(
      Sq8Encode(org.apache.spark.sql.GraftBridge.expression(vec), scale))


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
