package graft

import org.apache.spark.sql.functions._
import graft.sources.MergeOnRead

/** Merge-on-read delete semantics (tombstone coverage, max-tombstone
  * collapse, delete-then-reinsert) and the zero-exchange plan the
  * key-bucketed layout buys.
  */
class MergeOnReadSpec extends SparkTestBase {
  import spark.implicits._

  test("tombstones delete covered seqs only; reinsert after the " +
    "tombstone survives; max tombstone wins") {
    val base = Seq(
      (1L, 0L, "a"),   // deleted by tombstone at 5
      (1L, 9L, "a2"),  // reinserted AFTER the max tombstone — survives
      (2L, 0L, "b"),   // deleted (tombstone 7)
      (2L, 7L, "b2"),  // seq == tombstone seq → covered (<=), deleted
      (3L, 0L, "c"))   // never deleted
      .toDF("k", "seq", "v")
    // key 1 has TWO tombstones — only the max (5) matters; a row at
    // seq 4 would be covered by either
    val dels = Seq((1L, 3L), (1L, 5L), (2L, 7L)).toDF("k", "seq")
    MergeOnRead.stageBucketed(base, dels, "mor_spec_base", "mor_spec_dels",
      "k", buckets = 2)
    try {
      val got = MergeOnRead.read(spark, "mor_spec_base", "mor_spec_dels",
        "k", "seq").select("k", "seq", "v")
        .as[(Long, Long, String)].collect().toSet
      assert(got == Set((1L, 9L, "a2"), (3L, 0L, "c")), got.toString)

      // plan pin: with both sides key-bucketed at the same width, the
      // merged read is exchange-ZERO — the per-key tombstone max rides
      // the bucket layout and the left join arrives co-partitioned
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val plan = MergeOnRead.read(spark, "mor_spec_base",
            "mor_spec_dels", "k", "seq")
          .queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
        val n = plan.linesIterator
          .count(_.contains("Exchange hashpartitioning"))
        assert(n == 0, s"want 0 exchanges over bucketed layouts, got $n:\n$plan")
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS mor_spec_base")
      spark.sql("DROP TABLE IF EXISTS mor_spec_dels")
    }
  }
}
