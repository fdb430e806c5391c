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

  test("compactHotPartitions: only hot dirs rewritten, probe-invariant, " +
    "pruning unchanged") {
    import spark.implicits._
    import graft.sources.Warehouse
    val table = "graft_test_hotcompact"
    def mk(ids: Range, cellOf: Int => Int): DataFrame =
      ids.map(i => (i.toLong, s"p$i", cellOf(i))).toDF("id", "payload", "cell")
    try {
      // base: cells 0..3; appends touch ONLY cells 0 and 1 (twice) —
      // those become hot (3 files), cells 2/3 stay single-file cold
      Warehouse.writePartitioned(
        mk(0 until 400, _ % 4).repartition(1), table, Seq("cell"))
      Warehouse.appendPartitioned(
        mk(400 until 500, _ % 2).repartition(1), table)
      Warehouse.appendPartitioned(
        mk(500 until 600, _ % 2).repartition(1), table)
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table)
      val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def files(cell: Int): Seq[String] =
        fs.listStatus(new org.apache.hadoop.fs.Path(wh, s"cell=$cell"))
          .toSeq.map(_.getPath.getName)
          .filter(n => !n.startsWith("_") && !n.startsWith("."))
      assert(files(0).size == 3 && files(1).size == 3 &&
        files(2).size == 1 && files(3).size == 1)
      val coldBefore = (files(2), files(3))
      val before = spark.table(table).as[(Long, String, Int)].collect().sorted

      val hot = Compaction.compactHotPartitions(spark, table, "cell",
        targetRows = 1000000L)
      assert(hot.toSet == Set("0", "1"), s"hot = $hot")

      // hot dirs compacted to the planned single file; cold dirs are
      // byte-identical (same file names — never rewritten)
      assert(files(0).size == 1 && files(1).size == 1)
      assert((files(2), files(3)) == coldBefore)
      // content is a multiset fixpoint
      val after = spark.table(table).as[(Long, String, Int)].collect().sorted
      assert(after.toSeq == before.toSeq)
      // partition pruning still reads only the probed directories
      val probe = spark.table(table).filter(col("cell").isin(0, 2))
      val scanned = probe.select(input_file_name()).distinct()
        .as[String].collect()
      assert(scanned.forall(f => f.contains("cell=0") || f.contains("cell=2")),
        s"probe read outside its cells: ${scanned.mkString(",")}")
      assert(probe.count() == before.count(r => r._3 == 0 || r._3 == 2))
      // a second pass finds nothing hot — idempotent maintenance
      assert(Compaction.compactHotPartitions(spark, table, "cell",
        1000000L).isEmpty)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
