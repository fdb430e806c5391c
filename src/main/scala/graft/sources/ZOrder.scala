package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) two-dimensional layout: interleave the bits
  * of two dimension keys so that a rectangular 2-D range predicate
  * prunes to a small set of partition directories — the multi-dim
  * clustering every lakehouse table format (Delta OPTIMIZE ZORDER,
  * Iceberg sort orders) offers, expressed with the same
  * write-once/probe-a-sliver machinery as the IVF index (v11) and the
  * bucketed warehouse (s02). One dimension alone could use plain
  * partitioning; z-order keeps BOTH dimensions selective at once —
  * a box over (x, y) touches only the Morton cells its corner bits
  * span, O(perimeter) of the grid instead of O(area) of one-dim
  * slices.
  *
  * Everything here is exact integer arithmetic on non-negative keys
  * (div/mod bit extraction — no bit intrinsics needed), so the cell
  * assignment is reproducible on any engine, and the bucket column is
  * derivable in a SQL mirror. The probe's bucket list is computed on
  * the DRIVER from the box bounds (a bounded 2^tb × 2^tb grid walk —
  * codebook-class work) and lands in the plan as `zb IN (…)` literals:
  * partition pruning happens at PLANNING time, before any task runs.
  */
object ZOrder {

  /** Morton cell id for quantized coordinates: interleave the low `tb`
    * bits of xb (odd positions) and yb (even positions). Driver-side
    * twin of [[zBucket]].
    */
  def interleave(xb: Int, yb: Int, tb: Int): Int =
    (0 until tb).foldLeft(0) { (acc, i) =>
      acc | (((xb >> i) & 1) << (2 * i + 1)) | (((yb >> i) & 1) << (2 * i))
    }

  /** The z-bucket Column: quantize each dim by its cell width, cap at
    * 2^tb − 1 (overflow values share the top cell), interleave. Pure
    * per-row integer expression.
    */
  def zBucket(x: Column, y: Column, cellX: Long, cellY: Long,
              tb: Int): Column = {
    require(tb >= 1 && tb <= 15, s"tb must be in [1,15], got $tb")
    require(cellX > 0 && cellY > 0, "cell widths must be positive")
    val cap = (1 << tb) - 1
    // floor(double) quantization is exact for dimension keys < 2^52 —
    // far beyond any partition-key domain; capped into the top cell
    val xb = least(floor(x.cast("long") / cellX), lit(cap.toLong)).cast("int")
    val yb = least(floor(y.cast("long") / cellY), lit(cap.toLong)).cast("int")
    (0 until tb).map { i =>
      (shiftright(xb, i) % 2) * (1 << (2 * i + 1)) +
        (shiftright(yb, i) % 2) * (1 << (2 * i))
    }.reduce[Column](_ + _)
  }

  /** Driver-side bucket list for a box probe [xlo,xhi]×[ylo,yhi]: every
    * Morton cell the box's quantized corners span. Bounded by the 2^tb
    * grid — constant work, independent of table size.
    */
  def bucketsForBox(xlo: Long, xhi: Long, ylo: Long, yhi: Long,
                    cellX: Long, cellY: Long, tb: Int): Seq[Int] = {
    val cap = (1 << tb) - 1
    def q(v: Long, c: Long) = math.min(v / c, cap.toLong).toInt
    for {
      xb <- q(xlo, cellX) to q(xhi, cellX)
      yb <- q(ylo, cellY) to q(yhi, cellY)
    } yield interleave(xb, yb, tb)
  }

  /** Write `df` z-ordered: partitioned by the Morton bucket of
    * (xCol, yCol). The written table carries `zb` as its partition
    * directory key; a probe filters `zb IN (bucketsForBox(...))` +
    * the exact box predicate.
    */
  def writeZOrdered(df: DataFrame, table: String, xCol: String,
                    yCol: String, cellX: Long, cellY: Long,
                    tb: Int): Unit =
    Warehouse.writePartitioned(
      df.withColumn("zb", zBucket(col(xCol), col(yCol), cellX, cellY, tb)),
      table, Seq("zb"))

  /** Box probe over a [[writeZOrdered]] table: planning-time partition
    * pruning to the box's Morton cells, then the exact predicate (the
    * cells over-cover the box edges — correctness never depends on the
    * layout).
    */
  def readBox(spark: SparkSession, table: String, xCol: String,
              yCol: String, xlo: Long, xhi: Long, ylo: Long, yhi: Long,
              cellX: Long, cellY: Long, tb: Int): DataFrame = {
    val buckets = bucketsForBox(xlo, xhi, ylo, yhi, cellX, cellY, tb)
    Warehouse.read(spark, table)
      .filter(col("zb").isin(buckets: _*))
      .filter(col(xCol).between(xlo, xhi) && col(yCol).between(ylo, yhi))
  }
}
