package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column

/** Bloom-filter membership probe over a driver-built
  * `org.apache.spark.util.sketch.BloomFilter` (the public
  * `df.stat.bloomFilter` sketch) as a native codegen expression: the
  * filter ships once per executor like any referenced object and each row
  * costs a few hash probes — no join, no shuffle. OSS Spark's own
  * `bloom_filter_agg`/`might_contain` pair is internal-only (not in the
  * function registry, reserved for runtime join filters), so this is the
  * public-API equivalent for engine users.
  *
  * Child must be the LONG key (callers hash wider keys first, e.g.
  * `xxhash64(fp)`), matching the sketch's `putLong/mightContainLong`
  * fast path.
  */
case class BloomMightContain(child: Expression,
                             bloom: org.apache.spark.util.sketch.BloomFilter)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a bigint key, got ${dt.sql}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(h: Any): Any =
    bloom.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      "org.apache.spark.util.sketch.BloomFilter")
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $ref.mightContainLong($h);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}

object BloomMightContain {
  def mightContainLong(key: Column,
                       bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    org.apache.spark.sql.GraftBridge.column(
      BloomMightContain(org.apache.spark.sql.GraftBridge.expression(key), bloom))
}
