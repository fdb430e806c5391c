package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column

/** Product-quantization encoder as a native Catalyst expression with
  * whole-stage codegen: the input `array<double>` vector is split into `m`
  * equal subvectors and each is assigned the id of the L2-nearest codeword
  * slice. Replaces the per-subspace `aggregate(zip_with(...))` chains in
  * [[graft.operators.Similarity.pqCodes]], which Spark evaluates
  * interpreted (HOFs are CodegenFallback) at ~1 ms per row × m×|codebook|
  * chains (measured: v07 2.2 s → see Similarity.pqCodes).
  *
  * Distance semantics are EXACTLY the HOF form's (pinned by
  * TextKernelsSpec parity): each component delta is quantized to 1e-6
  * integers with Spark `round` semantics (BigDecimal HALF_UP — NOT
  * Math.round, which rounds negative .5 toward +∞) BEFORE squaring and
  * summing in exact long arithmetic, so the argmin (smallest codeword id
  * on ties — codewords scanned in ascending id order with strict-less
  * improvement) is bit-stable on any engine and partitioning.
  *
  * Returns `array<int>` of the m codes; null input → null, and a vector
  * whose length differs from the codebook dimension → null (the HOF form
  * would poison every distance through zip_with null padding — no
  * meaningful code exists either way).
  */
case class PqEncode(child: Expression, cids: Seq[Int],
                    centroids: Seq[Seq[Double]], m: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<double>, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def nullable: Boolean = true

  @transient private lazy val table: PqEncode.Codebook =
    PqEncode.Codebook(cids.toArray, centroids.map(_.toArray).toArray, m)

  override protected def nullSafeEval(v: Any): Any =
    table.encode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", table,
      "graft.plans.PqEncode.Codebook")
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $ref.encode($v);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {

  /** Precomputed flat codebook; `encode` is the per-row kernel. */
  final case class Codebook(cids: Array[Int], centroids: Array[Array[Double]],
                            m: Int) {
    require(m >= 1 && centroids.nonEmpty)
    require(cids.length == centroids.length)
    private val dim = centroids(0).length
    require(dim % m == 0 && centroids.forall(_.length == dim))
    private val sub = dim / m
    // scan order = ascending cid, so strict-less keeps the smallest id on
    // ties — same as the HOF form's struct-min over (d, cid)
    private val order: Array[Int] = cids.indices.sortBy(cids(_)).toArray

    def encode(v: ArrayData): ArrayData = {
      if (v.numElements() != dim) return null
      val codes = new Array[Int](m)
      var j = 0
      while (j < m) {
        var bestD = Long.MaxValue
        var bestC = -1
        var oi = 0
        while (oi < order.length) {
          val c = order(oi)
          val ctr = centroids(c)
          var d = 0L
          var i = j * sub
          val end = i + sub
          while (i < end) {
            val q = roundE6(v.getDouble(i) - ctr(i))
            d += q * q
            i += 1
          }
          if (d < bestD) { bestD = d; bestC = cids(c) }
          oi += 1
        }
        codes(j) = bestC
        j += 1
      }
      new GenericArrayData(codes)
    }
  }

  /** `round(x * 1e6).cast("bigint")` with Spark's Round semantics:
    * BigDecimal HALF_UP on the double's shortest decimal representation.
    */
  def roundE6(x: Double): Long = {
    val scaled = x * 1e6
    if (scaled == math.rint(scaled)) scaled.toLong
    else java.math.BigDecimal.valueOf(scaled)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
  }

  def pqEncode(vec: Column, codebook: Seq[(Int, Array[Double])],
               m: Int): Column = {
    val sorted = codebook.sortBy(_._1)
    org.apache.spark.sql.GraftBridge.column(
      PqEncode(org.apache.spark.sql.GraftBridge.expression(vec),
        sorted.map(_._1), sorted.map(_._2.toSeq), m))
  }
}
