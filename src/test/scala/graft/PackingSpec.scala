package graft

import org.apache.spark.sql.functions._
import graft.functions.text
import graft.operators.Packing

/** Next-fit sequence packing: hand-computed boundaries, zero-token and
  * oversized-document edges, group-boundary resets, partitioning
  * invariance, and parity with an independent serial fold over the real
  * documents table.
  */
class PackingSpec extends SparkTestBase {
  import spark.implicits._

  /** The spec's own next-fit fold — deliberately the dumbest possible
    * serial form, as the parity oracle.
    */
  private def serialPack(rows: Seq[(String, Long, Long)],
                         budget: Long): Map[(String, Long), Long] =
    rows.sorted.groupBy(_._1).flatMap { case (g, rs) =>
      var filled = 0L
      var seq = 0L
      rs.sortBy(_._2).map { case (_, id, tok) =>
        if (filled > 0 && filled + tok > budget) { seq += 1; filled = 0L }
        filled += tok
        (g, id) -> seq
      }
    }

  private def packed(rows: Seq[(String, Long, Long)], budget: Long,
                     parts: Int = 1): Map[(String, Long), Long] =
    Packing.nextFitPack(
        rows.toDF("source", "doc_id", "n_tok").repartition(parts),
        "source", "doc_id", "n_tok", budget)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap

  test("hand-computed boundaries incl. oversized-doc-alone") {
    val rows = Seq(("a", 1L, 4L), ("a", 2L, 4L), ("a", 3L, 4L),
      ("a", 4L, 12L), ("a", 5L, 2L), ("a", 6L, 9L), ("a", 7L, 10L))
    val got = packed(rows, budget = 10)
    val want = Map(("a", 1L) -> 0L, ("a", 2L) -> 0L, ("a", 3L) -> 1L,
      ("a", 4L) -> 2L, ("a", 5L) -> 3L, ("a", 6L) -> 4L, ("a", 7L) -> 5L)
    assert(got == want)
  }

  test("zero-token rows join the open sequence; exact fit closes on next") {
    val rows = Seq(("a", 1L, 5L), ("a", 2L, 0L), ("a", 3L, 1L))
    assert(packed(rows, budget = 5) ==
      Map(("a", 1L) -> 0L, ("a", 2L) -> 0L, ("a", 3L) -> 1L))
  }

  test("group boundaries reset the fold; result invariant to partitioning") {
    val rnd = new scala.util.Random(11)
    val rows = for {
      g <- Seq("web", "books", "code", "wiki")
      i <- 1 to 200
    } yield (g, i.toLong, rnd.nextInt(40).toLong)
    val want = serialPack(rows, budget = 100)
    // shuffled input order AND different partition counts must not matter
    for (parts <- Seq(1, 3, 8)) {
      assert(packed(rnd.shuffle(rows), budget = 100, parts) == want,
        s"diverges at $parts partitions")
    }
  }

  test("parity with the serial fold on the real documents table") {
    val rows = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("source"), col("doc_id"),
        text.tokenCount(col("text")).cast("long").as("n_tok"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(packed(rows, budget = 1024, parts = 8) ==
      serialPack(rows, budget = 1024))
  }
}
