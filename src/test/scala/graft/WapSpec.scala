package graft

import org.apache.spark.sql.functions._
import graft.sources.{Wap, Warehouse}

/** Write–audit–publish (sources/Wap): the audit is one aggregate pass,
  * NULL observed fails, a failing batch aborts without landing a byte,
  * and a passing batch appends exactly its rows. The full gate is
  * oracled end-to-end by s16.
  */
class WapSpec extends SparkTestBase {
  import spark.implicits._

  private def expects = Seq(
    Wap.Expect("nulls",
      sum(when(col("k").isNull, 1L).otherwise(0L)), 0L, 0L),
    Wap.Expect("rows", count(lit(1)), 1L, Long.MaxValue),
    Wap.Expect("max_v", max(col("v")), 1L, 1000L))

  test("audit computes observed/bounds/passed per expectation") {
    val batch = Seq((Some(1L), 10L), (Some(2L), 999L)).toDF("k", "v")
    val a = Wap.audit(batch, expects)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(a("nulls") == (("nulls", 0L, 0L, 0L, 1L)))
    assert(a("rows") == (("rows", 2L, 1L, Long.MaxValue, 1L)))
    assert(a("max_v") == (("max_v", 999L, 1L, 1000L, 1L)))
  }

  test("NULL observed (aggregate over zero rows) fails, not passes") {
    val empty = Seq.empty[(Option[Long], Long)].toDF("k", "v")
    val a = Wap.audit(empty, expects).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    // max over zero rows is NULL -> fail; count(*) = 0 < lo 1 -> fail;
    // sum over zero rows is NULL -> fail (absence of evidence)
    assert(a == Map("nulls" -> 0L, "rows" -> 0L, "max_v" -> 0L))
  }

  test("failing batch aborts with zero rows landed; passing batch appends") {
    val base = Seq((Some(1L), 5L)).toDF("k", "v")
    Warehouse.writeTable(base, "graft_wap_spec")
    val bad = Seq((Option.empty[Long], 7L), (Some(3L), 8L)).toDF("k", "v")
    val aBad = Wap.audit(bad, expects).localCheckpoint()
    assert(!Wap.publishIfClean(bad, aBad, "graft_wap_spec"))
    assert(Warehouse.read(spark, "graft_wap_spec").count() == 1L)
    val good = Seq((Some(4L), 9L), (Some(5L), 10L)).toDF("k", "v")
    val aGood = Wap.audit(good, expects).localCheckpoint()
    assert(Wap.publishIfClean(good, aGood, "graft_wap_spec"))
    assert(Warehouse.read(spark, "graft_wap_spec").count() == 3L)
  }

  test("publish reorders columns against the stored schema (positional" +
    " insert can never scramble)") {
    Warehouse.writeTable(Seq((1L, "x")).toDF("k", "s"), "graft_wap_spec2")
    val reordered = Seq(("y", 2L)).toDF("s", "k")
    val a = Wap.audit(reordered,
      Seq(Wap.Expect("rows", count(lit(1)), 1L, 10L))).localCheckpoint()
    assert(Wap.publishIfClean(reordered, a, "graft_wap_spec2"))
    val got = Warehouse.read(spark, "graft_wap_spec2")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "x", 2L -> "y"))
  }
}
