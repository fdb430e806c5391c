package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column
import org.apache.spark.unsafe.types.UTF8String

/** Native GTFS time-of-day codecs (SURVEY §2.4 X2–X4). Byte-equivalent to
  * the `Column` compositions in graft.functions.timecodec, which are what
  * the DuckDB oracles and the GTFS golden files pin down:
  *
  *  - SecToTime == `format_string("%02d:%02d:%02d", ...)` over
  *    `bround(c)` — java.util.Formatter walks a format parser and locale
  *    tables per row; this kernel emits digits directly. Rounding is
  *    half-even (Math.rint == BigDecimal HALF_EVEN on the exact binary
  *    double), hours may exceed 24 and keep printing (%02d widens).
  *  - TimeToSec == `when(rlike(^\d+:\d{2}(:\d{2})?$), h*3600+m*60+s)
  *    .otherwise(0)` including the edge semantics: hour strings that
  *    overflow INT cast to null (whole result null), and h*3600 wraps in
  *    32-bit like Spark's non-ANSI int arithmetic.
  */
case class SecToTime(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"sec_to_time expects numeric, got ${dt.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "sec_to_time"

  private def toDouble(v: Any): Double = v match {
    case d: Double => d
    case i: Int => i.toDouble
    case l: Long => l.toDouble
  }

  override protected def nullSafeEval(v: Any): Any =
    TimeKernels.secToTime(toDouble(v))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.TimeKernels.secToTime((double)($s))")

  override protected def withNewChildInternal(newChild: Expression): SecToTime =
    copy(child = newChild)
}

case class TimeToSec(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"time_to_sec expects string, got ${dt.sql}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "time_to_sec"

  // NULL input parses to 0, like the `when(rlike...).otherwise(0)` form it
  // replaced (a null predicate falls through to the otherwise branch) —
  // the reference's parse_time treats anything non-time-shaped as 0.
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) Int.box(0)
    else TimeKernels.timeToSec(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val boxed = ctx.freshName("boxed")
    ev.copy(code = c.code +
      org.apache.spark.sql.catalyst.expressions.codegen.CodeBlock(Seq(
        s"""
         boolean ${ev.isNull} = false;
         int ${ev.value} = 0;
         if (!${c.isNull}) {
           Integer $boxed = graft.plans.TimeKernels.timeToSec(${c.value});
           if ($boxed == null) { ${ev.isNull} = true; }
           else { ${ev.value} = $boxed.intValue(); }
         }
         """), Seq.empty))
  }

  override protected def withNewChildInternal(newChild: Expression): TimeToSec =
    copy(child = newChild)
}

object TimeKernels {

  /** Half-even round to long, then zero-padded HH:MM:SS (hours widen). */
  def secToTime(v: Double): UTF8String = {
    val s = Math.rint(v).toLong
    val h = s / 3600
    val m = (s % 3600) / 60
    val sec = s % 60
    if (s < 0) // rare; defer to Formatter for exact negative-width parity
      return UTF8String.fromString(String.format("%02d:%02d:%02d",
        java.lang.Long.valueOf(h), java.lang.Long.valueOf(m),
        java.lang.Long.valueOf(sec)))
    val hs = java.lang.Long.toString(h)
    val sb = new java.lang.StringBuilder(hs.length.max(2) + 6)
    if (h >= 0 && hs.length < 2) sb.append('0')
    sb.append(hs).append(':')
    sb.append(('0' + m / 10).toChar).append(('0' + m % 10).toChar).append(':')
    sb.append(('0' + sec / 10).toChar).append(('0' + sec % 10).toChar)
    UTF8String.fromString(sb.toString)
  }

  /** Parse "H+:MM[:SS]"; non-matching shapes → 0; INT-overflowing hour
    * fields → null (mirroring cast-to-int overflow); 32-bit wrap on the
    * h*3600 product (mirroring non-ANSI int arithmetic). Returns a boxed
    * Integer so null is representable.
    */
  def timeToSec(u: UTF8String): Integer = {
    val b = u.getBytes
    val n = b.length
    // match ^\d+:\d{2}(:\d{2})?$ while locating the colons
    var i = 0
    while (i < n && b(i) >= '0' && b(i) <= '9') i += 1
    val hDigits = i
    if (hDigits == 0 || i >= n || b(i) != ':') return Int.box(0)
    if (n != i + 3 && n != i + 6) return Int.box(0)
    if (b(i + 1) < '0' || b(i + 1) > '9' || b(i + 2) < '0' || b(i + 2) > '9')
      return Int.box(0)
    if (n == i + 6 && (b(i + 3) != ':' ||
        b(i + 4) < '0' || b(i + 4) > '9' || b(i + 5) < '0' || b(i + 5) > '9'))
      return Int.box(0)
    var hours = 0L
    var k = 0
    while (k < hDigits) {
      hours = hours * 10 + (b(k) - '0')
      if (hours > Int.MaxValue) return null // cast overflow → null
      k += 1
    }
    val mm = (b(i + 1) - '0') * 10 + (b(i + 2) - '0')
    val ss = if (n == i + 6) (b(i + 4) - '0') * 10 + (b(i + 5) - '0') else 0
    Int.box(hours.toInt * 3600 + mm * 60 + ss) // int wrap like Spark's +/*
  }

  def secToTime(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      SecToTime(org.apache.spark.sql.GraftBridge.expression(c)))

  def timeToSec(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      TimeToSec(org.apache.spark.sql.GraftBridge.expression(c)))
}
