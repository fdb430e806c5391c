package graft

import org.apache.spark.sql.functions._
import graft.operators.Funnel

/** Ordered-funnel fold: hand-computed stage walks (strict-inequality
  * ties, inclusive window boundary, out-of-order stages, first-touch
  * no-backtracking) and parity with an independent serial fold over the
  * real events table.
  */
class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  private val stages = Seq("view", "click", "purchase")

  private def reached(ev: Seq[(Long, String, Long)], windowUs: Long) =
    Funnel.funnelStages(
        ev.toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", stages, windowUs)
      .as[(Long, Int)].collect().toMap

  test("hand walks: ties, window boundary, order, no-backtrack") {
    val ev = Seq(
      // u1: clean walk to stage 3, every hop inside the 50-unit window
      (1L, "view", 100L), (1L, "click", 140L), (1L, "purchase", 180L),
      // u2: click at EXACTLY the view ts — strict > means not advanced
      (2L, "view", 100L), (2L, "click", 100L),
      // u3: click exactly at the window edge (inclusive) then purchase
      // one past it (exclusive) — reaches 2, not 3
      (3L, "view", 100L), (3L, "click", 150L), (3L, "purchase", 201L),
      // u4: purchase BEFORE the view never counts; the later click does
      (4L, "purchase", 50L), (4L, "view", 100L), (4L, "click", 120L),
      // u5: first view leads nowhere (next click outside window); the
      // funnel does NOT retry from the second view — first-touch
      (5L, "view", 100L), (5L, "view", 500L), (5L, "click", 520L),
      // u6: non-stage noise only
      (6L, "error", 100L))
    assert(reached(ev, windowUs = 50L) ==
      Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 2, 5L -> 1))
  }

  test("matches an independent serial fold on the real events table") {
    val w = 24L * 3600 * 1000000
    val ev = Tables(spark, sfSmoke).events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .as[(Long, String, Long)].collect().toSeq
    val got = reached(ev, w)
    val expect = ev.filter(e => stages.contains(e._2))
      .groupBy(_._1).map { case (u, es) =>
        var r = 0
        var t = Long.MinValue
        for ((_, tp, ts) <- es.sortBy(e => (e._3, e._2))) {
          if (r < stages.length && tp == stages(r) && ts > t &&
              (r == 0 || ts <= t + w)) { r += 1; t = ts }
        }
        u -> r
      }
    assert(got == expect)
  }
}
