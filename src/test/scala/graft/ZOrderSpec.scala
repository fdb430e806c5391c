package graft

import org.apache.spark.sql.functions._
import graft.sources.ZOrder

/** Z-order layout: Morton interleave correctness, driver/engine cell
  * agreement, box-bucket enumeration, probe ≡ raw filter, and the
  * planning-time pruning property (partitions read = box cells).
  */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("interleave: known Morton values and driver/engine agreement") {
    // 2-bit: (xb=3, yb=0) → x bits at odd positions: 1010 = 10
    assert(ZOrder.interleave(3, 0, 2) == 10)
    assert(ZOrder.interleave(0, 3, 2) == 5)
    assert(ZOrder.interleave(3, 3, 2) == 15)
    assert(ZOrder.interleave(1, 2, 2) == 6) // x=01→_0_1=0010? x odd pos: 0·8+1·2=2; y=10: 1·4+0·1=4 → 6
    // engine column agrees with the driver twin on a key sweep
    val got = (0L until 64L).map(i => (i * 7 % 40, i * 13 % 20))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.zBucket(col("x"), col("y"), cellX = 10, cellY = 5, tb = 2)
          .as("zb"))
      .as[(Long, Long, Int)].collect()
    got.foreach { case (x, y, zb) =>
      val xb = math.min(x / 10, 3).toInt; val yb = math.min(y / 5, 3).toInt
      assert(zb == ZOrder.interleave(xb, yb, 2), s"($x,$y)")
    }
  }

  test("bucketsForBox covers exactly the quantized corner span") {
    val b = ZOrder.bucketsForBox(12, 27, 0, 4, cellX = 10, cellY = 5, tb = 2)
    // xb 1..2, yb 0..0 → cells interleave(1,0)=2, interleave(2,0)=8
    assert(b.sorted == Seq(2, 8))
  }

  test("z-ordered probe equals the raw box filter; scan prunes to box cells") {
    val li = Tables(spark, sfSmoke).lineitem
      .select("l_partkey", "l_suppkey", "l_quantity")
    ZOrder.writeZOrdered(li, "z_spec_li", "l_partkey", "l_suppkey",
      cellX = 2560, cellY = 128, tb = 3)
    try {
      val q = ZOrder.readBox(spark, "z_spec_li", "l_partkey", "l_suppkey",
        0L, 2559L, 0L, 127L, 2560L, 128L, 3)
      val got = q.agg(count(lit(1)), sum(col("l_quantity"))).head()
      val want = li.filter(col("l_partkey").between(0, 2559) &&
          col("l_suppkey").between(0, 127))
        .agg(count(lit(1)), sum(col("l_quantity"))).head()
      assert(got == want)
      // pruning: 1 cell requested → at most 1 partition read (smoke
      // data may not populate every cell, hence <=)
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
      def allScans(p: SparkPlan): Seq[FileSourceScanExec] =
        (p match {
          case s: FileSourceScanExec => Seq(s)
          case _ => Nil
        }) ++ (p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case qs: QueryStageExec => Seq(qs.plan)
          case r: ReusedExchangeExec => Seq(r.child)
          case other => other.children
        }).flatMap(allScans)
      // planning-time file listing (runtime metrics on the pre-AQE plan
      // instance stay 0, which made the old numPartitions pin vacuous)
      val scans = allScans(q.queryExecution.executedPlan)
        .filter(_.metadata.getOrElse("PartitionFilters", "[]") != "[]")
      assert(scans.nonEmpty, "no partition-filtered scan")
      val partsRead = scans.map(_.selectedPartitions.partitionCount).max
      assert(partsRead == 1,
        s"box spans 1 Morton cell but scan reads $partsRead partitions")
    } finally
      spark.sql("DROP TABLE IF EXISTS z_spec_li")
  }
}
