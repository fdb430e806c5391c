package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Compaction

/** The compaction executor's file-level contracts (sources/Compaction):
  * row-bounded files, non-overlapping (boundary-touch-only) key ranges,
  * rows sorted within every file, and multiset-lossless content — the
  * layout properties the s09 oracle's checksum can't see.
  */
class CompactionSpec extends SparkTestBase {

  private val Target = 500L

  private def input: DataFrame = spark.read
    .parquet(s"$sfSmoke/lineitem.parquet")
    .select(
      datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
        .cast("long").as("ship_day"),
      col("l_orderkey"), col("l_extendedprice"))

  private def checksum(d: DataFrame): Long = d.agg(
    sum((round(col("l_extendedprice") * 100).cast("long") % 9973) *
      (col("l_orderkey") % 997 + 1))).head().getLong(0)

  test("compactSorted: lossless, row-bounded, range-contiguous, " +
    "sorted within every file") {
    val df = input
    val rows = df.count()
    Compaction.compactSorted(df, "graft_test_compact", "ship_day", Target)
    val t = spark.table("graft_test_compact")

    // multiset-lossless: same cardinality and content checksum
    assert(t.count() == rows)
    assert(checksum(t) == checksum(df))

    // per-file stats via input_file_name over the managed table
    val files = t.select(input_file_name().as("f"), col("ship_day"))
      .groupBy(col("f"))
      .agg(count(lit(1)).as("n"),
        min(col("ship_day")).as("lo"), max(col("ship_day")).as("hi"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // every file honors the row bound
    files.foreach { case (f, n, _, _) =>
      assert(n <= Target, s"$f holds $n rows > $Target")
    }
    // file count is the planned ⌈rows/target⌉ plus at most the
    // maxRecordsPerFile split slack
    val planned = math.ceil(rows.toDouble / Target).toLong
    assert(files.length >= planned && files.length <= 2 * planned + 1,
      s"${files.length} files for $rows rows at target $Target")

    // ranges ordered by lo never overlap beyond an equal boundary key
    // (repartitionByRange keeps equal keys together; only the in-
    // partition file split may duplicate a boundary key)
    val ranges = files.map { case (_, _, lo, hi) => (lo, hi) }.sorted.toList
    ranges.zip(ranges.drop(1)).foreach { case ((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, s"file ranges overlap: hi=$hi1 > next lo=$lo2")
    }

    // rows are sorted inside every physical file (single-file read
    // preserves row-group order)
    files.foreach { case (f, _, _, _) =>
      val days = spark.read.parquet(f).select(col("ship_day"))
        .collect().map(_.getLong(0))
      assert(days.zip(days.drop(1)).forall { case (a, b) => a <= b },
        s"$f is not sorted on ship_day")
    }
  }

  test("targetRows must be positive") {
    intercept[IllegalArgumentException] {
      Compaction.compactSorted(input, "graft_test_compact_bad",
        "ship_day", 0L)
    }
  }
}
