package graft

import org.apache.spark.sql.functions._
import graft.operators.Skyline

/** Pareto frontier: dominance semantics on crafted points (ties on each
  * axis, exact duplicates, nulls) and parity with the brute-force O(n²)
  * dominance test on real documents.
  */
class SkylineSpec extends SparkTestBase {
  import spark.implicits._

  // maximize x, minimize y
  private def frontier(rows: (Long, Long, Long)*): Seq[Long] =
    Skyline.paretoFrontier(rows.toDF("id", "x", "y"), "x", "y")
      .select("id").as[Long].collect().sorted.toSeq

  test("basic dominance: strictly-better point removes strictly-worse") {
    // (10,1) dominates (5,3) and (10,2); (12,5) survives on x, (3,0) on y
    assert(frontier((1L, 10L, 1L), (2L, 5L, 3L), (3L, 10L, 2L),
      (4L, 12L, 5L), (5L, 3L, 0L)) == Seq(1L, 4L, 5L))
  }

  test("equal-x ties: only the min-y rows at that x survive") {
    assert(frontier((1L, 10L, 1L), (2L, 10L, 1L), (3L, 10L, 2L)) ==
      Seq(1L, 2L)) // exact duplicates both kept; worse-y same-x dropped
  }

  test("equal-y ties: only the max-x rows at that y survive") {
    assert(frontier((1L, 10L, 1L), (2L, 8L, 1L), (3L, 10L, 1L)) ==
      Seq(1L, 3L))
  }

  test("a diagonal staircase is entirely on the frontier") {
    val stairs = (1L to 6L).map(i => (i, i, i)) // x and y both rise
    assert(frontier(stairs: _*) == (1L to 6L))
  }

  test("null coordinates are dropped, not compared") {
    val df = Seq((1L, Some(10L), Some(1L)), (2L, None, Some(0L)),
      (3L, Some(99L), None)).toDF("id", "x", "y")
    val out = Skyline.paretoFrontier(df, "x", "y")
      .select("id").as[Long].collect().toSeq
    assert(out == Seq(1L))
  }

  test("decomposed frontier equals brute-force dominance on documents") {
    val d = Tables(spark, sfSmoke).documents
      .select(col("doc_id"),
        col("n_chars").as("x"),
        graft.functions.text.markerHits(col("text"),
          graft.queries.TextQ.StopWords).cast("bigint").as("y"))
    val got = Skyline.paretoFrontier(d, "x", "y")
      .select("doc_id").as[Long].collect().toSet
    val all = d.as[(Long, Long, Long)].collect()
    val brute = all.filter { b =>
      !all.exists(a => a._2 >= b._2 && a._3 <= b._3 &&
        (a._2 > b._2 || a._3 < b._3))
    }.map(_._1).toSet
    assert(got == brute && got.nonEmpty)
  }
}
