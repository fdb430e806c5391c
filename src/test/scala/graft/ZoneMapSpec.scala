package graft

import org.apache.spark.sql.functions._
import graft.sources.ZoneMap

/** Zone-map skipping: probe ≡ raw filter, stats correctness, and the
  * planning-time pruning property (partitions read = files whose
  * [min,max] intersects the range).
  */
class ZoneMapSpec extends SparkTestBase {
  import spark.implicits._

  test("zone-mapped probe equals the raw range filter; scan skips files") {
    val li = Tables(spark, sfSmoke).lineitem.select(
      (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
        .cast("long").as("mon"),
      datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
        .cast("long").as("day"),
      col("l_quantity"))
    ZoneMap.writeWithStats(li, "zm_spec_li", "mon", "day")
    try {
      // a range inside ONE month: stats must prune to that single file
      val lo = java.time.LocalDate.of(1996, 6, 5).toEpochDay
      val hi = java.time.LocalDate.of(1996, 6, 25).toEpochDay
      val q = ZoneMap.readRange(spark, "zm_spec_li", "mon", "day", lo, hi)
      val got = q.agg(count(lit(1)), sum(col("l_quantity"))).head()
      val want = li.filter(col("day").between(lo, hi))
        .agg(count(lit(1)), sum(col("l_quantity"))).head()
      assert(got == want && got.getLong(0) > 0)
      // stats table: one row per month-file, lo <= hi, day inside month
      val stats = spark.table(ZoneMap.statsTable("zm_spec_li"))
      assert(stats.count() ==
        li.select("mon").distinct().count())
      assert(stats.filter(col("lo") > col("hi")).count() == 0)
      // pruning evidence: the probed scan reads exactly 1 partition
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
      def allScans(p: SparkPlan): Seq[FileSourceScanExec] =
        (p match {
          case s: FileSourceScanExec => Seq(s)
          case _ => Nil
        }) ++ (p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case qs: QueryStageExec => Seq(qs.plan)
          case r: ReusedExchangeExec => Seq(r.child)
          case other => other.children
        }).flatMap(allScans)
      // planning-time truth (metrics on the pre-AQE instance stay 0):
      // the file listing the scan will actually read
      val scans = allScans(q.queryExecution.executedPlan)
        .filter(_.metadata.getOrElse("PartitionFilters", "[]") != "[]")
      assert(scans.nonEmpty, "no partition-filtered scan")
      val partsRead = scans.map(_.selectedPartitions.partitionCount).max
      assert(partsRead == 1,
        s"in-month range should read 1 file, read $partsRead")
    } finally {
      spark.sql("DROP TABLE IF EXISTS zm_spec_li")
      spark.sql(s"DROP TABLE IF EXISTS ${ZoneMap.statsTable("zm_spec_li")}")
    }
  }

  test("a range missing every zone reads nothing and returns empty") {
    val df = Seq((1L, 10L, "a"), (1L, 19L, "b"), (2L, 40L, "c"))
      .toDF("f", "d", "v")
    ZoneMap.writeWithStats(df, "zm_spec_tiny", "f", "d")
    try {
      // 20..39 falls in the gap between file 1's [10,19] and file 2's [40,40]
      assert(ZoneMap.readRange(spark, "zm_spec_tiny", "f", "d", 20, 39)
        .count() == 0)
      // stats over-coverage is harmless: 15..45 reads both, exact
      // predicate still filters to the true rows
      val got = ZoneMap.readRange(spark, "zm_spec_tiny", "f", "d", 15, 45)
        .select("v").as[String].collect().toSet
      assert(got == Set("b", "c"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS zm_spec_tiny")
      spark.sql(s"DROP TABLE IF EXISTS ${ZoneMap.statsTable("zm_spec_tiny")}")
    }
  }

  test("bloom-skip point lookup: equals raw filter, prunes to the key's " +
    "files, absent key reads at most fp files and returns empty") {
    import graft.sources.BloomSkip
    val li = Tables(spark, sfSmoke).lineitem.select(
      (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
        .cast("long").as("mon"),
      col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    BloomSkip.writeWithBlooms(li, "bs_spec_li", "mon", "l_orderkey")
    try {
      val key = li.agg(min(col("l_orderkey"))).head().getLong(0)
      val q = BloomSkip.readPoint(spark, "bs_spec_li", "mon",
        "l_orderkey", lit(key))
      val got = q.select("mon", "l_linenumber", "l_quantity")
        .as[(Long, Int, Double)].collect().sorted.toSeq
      val want = li.filter(col("l_orderkey") === key)
        .select("mon", "l_linenumber", "l_quantity")
        .as[(Long, Int, Double)].collect().sorted.toSeq
      assert(got == want && got.nonEmpty)
      // pruning: the probed scan lists only the files whose bitmap
      // contains the key's bucket — at least the key's true months,
      // far fewer than the table's months (the lookup key is
      // layout-independent, so a zone map could prune NOTHING here)
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
      def allScans(p: SparkPlan): Seq[FileSourceScanExec] =
        (p match {
          case s: FileSourceScanExec => Seq(s)
          case _ => Nil
        }) ++ (p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case qs: QueryStageExec => Seq(qs.plan)
          case r: ReusedExchangeExec => Seq(r.child)
          case other => other.children
        }).flatMap(allScans)
      val total = li.select("mon").distinct().count()
      val trueMonths = want.map(_._1).distinct.size
      val scans = allScans(q.queryExecution.executedPlan)
        .filter(_.metadata.getOrElse("PartitionFilters", "[]") != "[]")
      assert(scans.nonEmpty, "no partition-filtered scan")
      val partsRead = scans.map(_.selectedPartitions.partitionCount).max
      assert(partsRead >= trueMonths && partsRead < total,
        s"read $partsRead of $total files (true months: $trueMonths)")
      // absent key: no false negatives is the bloom guarantee under
      // test's inverse — an id the table never held must come back
      // EMPTY (exact residual predicate) whatever the bitmaps matched
      val ghost = BloomSkip.readPoint(spark, "bs_spec_li", "mon",
        "l_orderkey", lit(-987654321L))
      assert(ghost.count() == 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bs_spec_li")
      spark.sql(s"DROP TABLE IF EXISTS ${BloomSkip.sketchTable("bs_spec_li")}")
    }
  }

  test("partition evolution: cross-cutover probe equals raw filter, " +
    "each generation prunes on its own key, both contribute") {
    import graft.sources.Evolution
    val li = Tables(spark, sfSmoke).lineitem.select(
      (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
        .cast("long").as("mon"),
      expr("CAST(datediff(to_date(l_shipdate), '1970-01-01') AS LONG)" +
        " div 7").as("wk"),
      datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
        .cast("long").as("day"),
      col("l_quantity"))
    val cutover = 199601L
    Evolution.writeEvolved(li, "ev_spec_li", "mon", "wk", cutover)
    try {
      val lo = java.time.LocalDate.of(1995, 11, 15).toEpochDay
      val hi = java.time.LocalDate.of(1996, 2, 15).toEpochDay
      val q = Evolution.readRange(spark, "ev_spec_li", "mon", "wk",
        "day", lo, hi, coarseLo = 199511L, coarseHi = 199602L,
        fineLo = lo / 7, fineHi = hi / 7)
      val got = q.agg(count(lit(1)), sum(col("l_quantity"))).head()
      val want = li.filter(col("day").between(lo, hi))
        .agg(count(lit(1)), sum(col("l_quantity"))).head()
      assert(got == want && got.getLong(0) > 0)
      // both generations contribute rows (the range spans the cutover)
      assert(q.filter(col("mon") < cutover).count() > 0)
      assert(q.filter(col("mon") >= cutover).count() > 0)
      // planning-time pruning per generation: the history scan reads
      // only the 2 in-range months; the new-data scan reads only the
      // in-range weeks — both far below their tables' partition counts
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
      def allScans(p: SparkPlan): Seq[FileSourceScanExec] =
        (p match {
          case s: FileSourceScanExec => Seq(s)
          case _ => Nil
        }) ++ (p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case qs: QueryStageExec => Seq(qs.plan)
          case r: ReusedExchangeExec => Seq(r.child)
          case other => other.children
        }).flatMap(allScans)
      val scans = allScans(q.queryExecution.executedPlan)
        .filter(_.metadata.getOrElse("PartitionFilters", "[]") != "[]")
      assert(scans.size == 2, s"want both generation scans, got $scans")
      val counts = scans.map(_.selectedPartitions.partitionCount).sorted
      val g0Total = spark.table("ev_spec_li_g0")
        .select("mon").distinct().count()
      val g1Total = spark.table("ev_spec_li_g1")
        .select("wk").distinct().count()
      assert(counts.head == 2, // Nov + Dec 1995
        s"history generation read ${counts.head} months, want 2")
      assert(counts.last <= 8 && counts.last < g1Total,
        s"new generation read ${counts.last} of $g1Total weeks")
      assert(counts.head < g0Total)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ev_spec_li_g0")
      spark.sql("DROP TABLE IF EXISTS ev_spec_li_g1")
    }
  }

  test("schema evolution: rename/add/promote read under the current " +
    "schema, typed NULLs for history, both generations prune") {
    import spark.implicits._
    import graft.sources.Evolution
    // old schema: (mon, k, price [INT]); evolved: price renamed to
    // cents and PROMOTED to LONG, disc added, k dropped
    val g0 = Seq((1L, 10L, 100), (1L, 11L, 110), (2L, 12L, 120))
      .toDF("mon", "k", "price")
    val g1 = Seq((3L, 300L, 30L), (4L, 400L, 40L))
      .toDF("mon", "cents", "disc")
    Evolution.writeSchemaGenerations(g0, g1, "se_spec", "mon")
    try {
      val r = Evolution.readEvolvedSchema(spark, "se_spec",
        Map("price" -> "cents"))
      // current schema wins: columns (stored order — the partitioned
      // write moves mon last), and promoted types
      assert(r.columns.toSeq == Seq("cents", "disc", "mon"))
      assert(r.schema("cents").dataType ==
        org.apache.spark.sql.types.LongType)
      val rows = r.select("mon", "cents", "disc")
        .as[(Long, Long, Option[Long])].collect().toSet
      assert(rows == Set((1L, 100L, None), (1L, 110L, None),
        (2L, 120L, None), (3L, 300L, Some(30L)), (4L, 400L, Some(40L))))
      // a partition predicate stacked on the evolved read still prunes
      // BOTH generations at planning time (the rename/add projections
      // are transparent to pushdown)
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
      def allScans(p: SparkPlan): Seq[FileSourceScanExec] =
        (p match {
          case s: FileSourceScanExec => Seq(s)
          case _ => Nil
        }) ++ (p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case qs: QueryStageExec => Seq(qs.plan)
          case r2: ReusedExchangeExec => Seq(r2.child)
          case other => other.children
        }).flatMap(allScans)
      val probe = r.filter(col("mon").isin(1L, 3L))
      assert(probe.count() == 3)
      val scans = allScans(probe.queryExecution.executedPlan)
        .filter(_.metadata.getOrElse("PartitionFilters", "[]") != "[]")
      assert(scans.size == 2, s"want both generation scans pruned: $scans")
      assert(scans.forall(_.selectedPartitions.partitionCount == 1),
        scans.map(_.selectedPartitions.partitionCount).toString)
      // an unknown rename source fails loudly, not silently
      intercept[IllegalArgumentException] {
        Evolution.readEvolvedSchema(spark, "se_spec", Map("nope" -> "x"))
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS se_spec_s0")
      spark.sql("DROP TABLE IF EXISTS se_spec_s1")
    }
  }
}
