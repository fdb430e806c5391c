package graft

import org.apache.spark.sql.functions._
import graft.operators.Cohort

/** Cohort retention: hand-computed triangle cells (pre-cohort activity
  * discarded, offset window clamp, distinct-user counting, uncohorted
  * entities excluded) and parity with an independent serial fold over
  * the real events table.
  */
class CohortSpec extends SparkTestBase {
  import spark.implicits._

  private def cells(ev: Seq[(Long, String, Long)], bucketUs: Long,
                    maxOffset: Int): Map[(Long, Long), Long] =
    Cohort.retention(ev.toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", "signup", bucketUs, maxOffset)
      .as[(Long, Long, Long)].collect()
      .map { case (c, o, n) => (c, o) -> n }.toMap

  test("hand-computed cells: pre-cohort, clamp, distinct, uncohorted") {
    val ev = Seq(
      // u1: signs up in bucket 1, active in 1 (twice — still one user),
      // 2, and 4
      (1L, "signup", 10L), (1L, "click", 12L), (1L, "view", 25L),
      (1L, "view", 45L),
      // u2: activity BEFORE its bucket-2 signup is discarded (no
      // negative offset, and no offset-0 credit from bucket 0)
      (2L, "view", 5L), (2L, "signup", 21L), (2L, "view", 39L),
      // u3: signs up in bucket 1, returns past maxOffset=3 — clamped out
      (3L, "signup", 15L), (3L, "view", 55L),
      // u4: never signs up — excluded entirely
      (4L, "view", 11L), (4L, "click", 22L))
    assert(cells(ev, bucketUs = 10L, maxOffset = 3) == Map(
      // bucket 1 cohort = {u1, u3}: offset 0 both (signup itself counts)
      (1L, 0L) -> 2L, (1L, 1L) -> 1L, (1L, 3L) -> 1L,
      // bucket 2 cohort = {u2}: offset 0 (signup), offset 1 (ts 39)
      (2L, 0L) -> 1L, (2L, 1L) -> 1L))
  }

  test("matches an independent serial fold on the real events table") {
    val bucket = 7L * 86400 * 1000000
    val ev = Tables(spark, sfSmoke).events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .as[(Long, String, Long)].collect().toSeq
    val cohort = ev.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._3).min / bucket }
    val expect = ev.flatMap { case (u, _, ts) =>
      cohort.get(u).map(c => (c, ts / bucket - c, u))
    }.filter(t => t._2 >= 0 && t._2 <= 8).distinct
      .groupBy(t => (t._1, t._2)).map { case (k, v) => k -> v.size.toLong }
    assert(cells(ev, bucket, maxOffset = 8) == expect)
    assert(expect.nonEmpty)
  }
}
