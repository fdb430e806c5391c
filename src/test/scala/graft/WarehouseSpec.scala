package graft

import org.apache.spark.sql.functions._
import graft.sources.Warehouse

/** Bucketed layout must make the recurring join exchange-free: both sides
  * bucketed by the join key with equal bucket counts sort-merge without
  * any shuffle (and, with sortBy, without a per-task sort of the scan).
  */
class WarehouseSpec extends SparkTestBase {

  test("bucketed-bucketed equi-join plans without exchanges") {
    Warehouse.writeBucketed(
      Tables(spark, sfSmoke).orders.select("o_orderkey", "o_totalprice"),
      "wh_orders", "o_orderkey", buckets = 8)
    Warehouse.writeBucketed(
      Tables(spark, sfSmoke).lineitem.select("l_orderkey", "l_quantity"),
      "wh_lineitem", "l_orderkey", buckets = 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Warehouse.read(spark, "wh_lineitem")
        .join(Warehouse.read(spark, "wh_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
      // and it still computes the right thing
      val n = joined.count()
      val expected = Tables(spark, sfSmoke).lineitem
        .join(Tables(spark, sfSmoke).orders,
          col("l_orderkey") === col("o_orderkey")).count()
      assert(n == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS wh_orders")
      spark.sql("DROP TABLE IF EXISTS wh_lineitem")
    }
  }

  test("partitioned write prunes directories for partition predicates") {
    Warehouse.writeBucketed(
      Tables(spark, sfSmoke).lineitem
        .select("l_orderkey", "l_quantity", "l_returnflag"),
      "wh_li_part", "l_orderkey", buckets = 4,
      partitionByCols = Seq("l_returnflag"))
    try {
      val q = Warehouse.read(spark, "wh_li_part")
        .filter(col("l_returnflag") === "R")
      val scan = q.queryExecution.executedPlan.toString
      // partition filters appear as PartitionFilters, not data filters
      assert(scan.contains("PartitionFilters"), scan)
      val n = q.count()
      val expected = Tables(spark, sfSmoke).lineitem
        .filter(col("l_returnflag") === "R").count()
      assert(n == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS wh_li_part")
    }
  }

  test("appendPartitioned is column-order independent (insertInto is " +
      "positional; saveAsTable moves partition cols to the end)") {
    import spark.implicits._
    Warehouse.writePartitioned(
      Seq((1L, "x", 10L), (2L, "y", 20L)).toDF("id", "payload", "cell"),
      "wh_append_reorder", Seq("cell"))
    try {
      // append with a DIFFERENT column order than the stored schema —
      // without the defensive reorder, 'cell' and 'payload' values would
      // silently land in each other's columns
      Warehouse.appendPartitioned(
        Seq((30L, 3L, "z")).toDF("cell", "id", "payload"),
        "wh_append_reorder")
      val got = Warehouse.read(spark, "wh_append_reorder")
        .select("id", "payload", "cell")
        .as[(Long, String, Long)].collect().toSet
      assert(got == Set((1L, "x", 10L), (2L, "y", 20L), (3L, "z", 30L)),
        got.toString)
    } finally {
      spark.sql("DROP TABLE IF EXISTS wh_append_reorder")
    }
  }
}
