package graft

import org.apache.spark.sql.functions._
import graft.operators.Intervals

/** Binned point-in-interval join: boundary semantics, no-duplicate
  * guarantee across bin replication, and parity with the naive
  * inequality join on real events.
  */
class IntervalsSpec extends SparkTestBase {
  import spark.implicits._

  private def pts(rows: (Long, Long, Long)*) =
    rows.toDF("k", "pt", "pid")
  private def ivs(rows: (Long, Long, Long, Long)*) =
    rows.toDF("k", "lo", "hi", "iid")

  test("half-open containment: lo inclusive, hi exclusive") {
    val out = Intervals.pointInInterval(
        pts((1L, 10L, 100L), (1L, 19L, 101L), (1L, 20L, 102L), (1L, 9L, 103L)),
        ivs((1L, 10L, 20L, 7L)),
        "k", "pt", "lo", "hi", binWidth = 4L)
      .select("pid").as[Long].collect().sorted
    assert(out.toSeq == Seq(100L, 101L)) // 20 (== hi) and 9 (< lo) excluded
  }

  test("an interval spanning many bins matches each point exactly once") {
    // interval [0, 100) over binWidth 7 replicates to 15 bins; every
    // contained point must still surface exactly once
    val p = (0L until 100L).map(t => (1L, t, t))
    val out = Intervals.pointInInterval(pts(p: _*), ivs((1L, 0L, 100L, 1L)),
      "k", "pt", "lo", "hi", binWidth = 7L)
    assert(out.count() == 100L)
    assert(out.select("pid").distinct().count() == 100L)
  }

  test("a point inside two intervals emits one row per interval") {
    val out = Intervals.pointInInterval(
        pts((1L, 15L, 100L)),
        ivs((1L, 10L, 20L, 7L), (1L, 14L, 16L, 8L), (1L, 16L, 30L, 9L)),
        "k", "pt", "lo", "hi", binWidth = 10L)
      .select("iid").as[Long].collect().sorted
    assert(out.toSeq == Seq(7L, 8L))
  }

  test("keys partition the join; empty intervals match nothing") {
    val out = Intervals.pointInInterval(
        pts((1L, 15L, 100L), (2L, 15L, 200L)),
        ivs((1L, 10L, 20L, 7L), (2L, 15L, 15L, 8L)),
        "k", "pt", "lo", "hi", binWidth = 10L)
      .select("pid").as[Long].collect()
    assert(out.toSeq == Seq(100L)) // key 2's interval is empty
  }

  test("binned join equals the naive inequality join on real events") {
    val ev = Tables(spark, sfSmoke).events
      .withColumn("ts_us", unix_micros(col("ts")))
    val iv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us").as("lo"),
        (col("ts_us") + 7200000000L).as("hi"), col("event_id").as("iid"))
    val p = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts_us"), col("event_id"))
    // deliberately mismatched bin width (interval length not a multiple)
    val binned = Intervals.pointInInterval(p, iv, "user_id", "ts_us",
        "lo", "hi", binWidth = 1234567L)
      .select("event_id", "iid").as[(Long, Long)].collect().toSet
    val naive = p.join(iv, Seq("user_id"))
      .filter(col("ts_us") >= col("lo") && col("ts_us") < col("hi"))
      .select("event_id", "iid").as[(Long, Long)].collect().toSet
    assert(binned == naive && binned.nonEmpty)
  }
}
