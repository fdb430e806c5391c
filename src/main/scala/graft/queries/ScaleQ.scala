package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Skew
import graft.sources.Warehouse

/** Scale-mitigation operators as driver-checkable queries: the salted
  * equi-join and the bucketed-warehouse co-located join. Both are pure
  * plan rewrites — the results must be IDENTICAL to the naive join, and
  * that identity is exactly what the DuckDB oracle (which runs the naive
  * SQL) verifies. Plan shape (salt fan-out, exchange-free SMJ) is pinned
  * separately by SkewSpec / WarehouseSpec.
  */
object ScaleQ extends QueryPack {

  /** Exact money cents — same convention as Relational.cents. */
  private def cents(c: Column): Column = round(c * 100).cast("bigint")

  /** Build-once guard for s02's at-rest bucketed layout: keyed by sfDir
    * so a session that switches scale factors rebuilds; synchronized so
    * concurrent first calls can't interleave the two writes.
    */
  @volatile private var bucketedFor: String = null
  private def ensureBucketed(s: SparkSession, dir: String): Unit =
    synchronized {
      if (bucketedFor != dir) {
        val t = Tables(s, dir)
        Warehouse.writeBucketed(
          t.orders.select("o_orderkey", "o_custkey", "o_totalprice"),
          "graft_wh_orders", "o_custkey", buckets = 8)
        Warehouse.writeBucketed(
          t.customer.select("c_custkey", "c_mktsegment"),
          "graft_wh_customer", "c_custkey", buckets = 8)
        bucketedFor = dir
      }
    }

  /** s03's z-order grid: lineitem clustered on (l_partkey, l_suppkey),
    * 3 bits per dim → 64 Morton cells. Cell widths sized so the sf0.1
    * key domains (partkey ≤ 20k, suppkey ≤ 1k) spread over the full
    * grid; smaller SFs just occupy the low cells — the bucket math is
    * scale-independent.
    */
  private[queries] val ZTb = 3
  private[queries] val ZCellX = 2560L
  private[queries] val ZCellY = 128L

  /** s05's zone-mapped layout: lineitem partitioned by ship-MONTH
    * "files" with per-file min/max stats on the ship-DAY — the probe
    * prunes on data statistics, not on key arithmetic (the reader never
    * learns the month encoding), which is what lets zone maps prune on
    * any column correlated with the ingest clustering.
    */
  private val ZmLo = java.time.LocalDate.of(1996, 3, 15).toEpochDay
  private val ZmHi = java.time.LocalDate.of(1996, 4, 30).toEpochDay

  /** Build-once guard for s05 (same pattern as [[ensureBucketed]]). */
  @volatile private var zoneMappedFor: String = null
  private def ensureZoneMapped(s: SparkSession, dir: String): Unit =
    synchronized {
      if (zoneMappedFor != dir) {
        graft.sources.ZoneMap.writeWithStats(
          Tables(s, dir).lineitem.select(
            (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
              .cast("long").as("ship_mon"),
            datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
              .cast("long").as("ship_day"),
            col("l_returnflag"), col("l_extendedprice"), col("l_discount")),
          "graft_wh_lineitem_zm", "ship_mon", "ship_day")
        zoneMappedFor = dir
      }
    }

  /** Build-once guard for s07's bloom-skipped layout (same pattern as
    * [[ensureBucketed]]): lineitem in ship-month "files" with per-file
    * membership bitmaps over the orderkey — the point-lookup key that
    * is UNCORRELATED with the month layout, which is exactly the case
    * zone maps cannot prune and blooms exist for.
    */
  @volatile private var bloomSkipFor: String = null
  private def ensureBloomSkip(s: SparkSession, dir: String): Unit =
    synchronized {
      if (bloomSkipFor != dir) {
        graft.sources.BloomSkip.writeWithBlooms(
          Tables(s, dir).lineitem.select(
            (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
              .cast("long").as("ship_mon"),
            col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
            cents(col("l_extendedprice")).as("price_cents")),
          "graft_wh_lineitem_bs", "ship_mon", "l_orderkey")
        bloomSkipFor = dir
      }
    }

  /** s08's evolved layout: lineitem history month-partitioned, rows
    * from CUTOVER month 1996-01 on week-partitioned (sources/Evolution
    * doc — the Iceberg partition-evolution semantics: history is never
    * rewritten). Probe range spans the cutover so BOTH generations
    * prune and contribute.
    */
  private val EvCutoverMon = 199601L
  private val EvLo = java.time.LocalDate.of(1995, 11, 15).toEpochDay
  private val EvHi = java.time.LocalDate.of(1996, 2, 15).toEpochDay

  /** Build-once guard for s08 (same pattern as [[ensureBucketed]]). */
  @volatile private var evolvedFor: String = null
  private def ensureEvolved(s: SparkSession, dir: String): Unit =
    synchronized {
      if (evolvedFor != dir) {
        graft.sources.Evolution.writeEvolved(
          Tables(s, dir).lineitem.select(
            (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
              .cast("long").as("ship_mon"),
            expr("CAST(datediff(to_date(l_shipdate), '1970-01-01') AS LONG)" +
              " div 7").as("ship_week"),
            datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
              .cast("long").as("ship_day"),
            col("l_returnflag"), col("l_extendedprice"), col("l_discount")),
          "graft_wh_lineitem_ev", "ship_mon", "ship_week",
          cutoverCoarse = EvCutoverMon)
        evolvedFor = dir
      }
    }

  private val SeLo = 199511L
  private val SeHi = 199602L

  /** Build-once guard for s14's two schema generations (same pattern as
    * [[ensureBucketed]]): history (< cutover month) written under the
    * ORIGINAL schema, current rows under the evolved one — renamed
    * price column, added discount column.
    */
  @volatile private var schemaEvolvedFor: String = null
  private def ensureSchemaEvolved(s: SparkSession, dir: String): Unit =
    synchronized {
      if (schemaEvolvedFor != dir) {
        val li = Tables(s, dir).lineitem.select(
          (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
            .cast("long").as("ship_mon"),
          col("l_returnflag"),
          cents(col("l_extendedprice")).as("price_cents"),
          round(col("l_discount") * 10000).cast("long").as("disc_bp"))
        graft.sources.Evolution.writeSchemaGenerations(
          li.filter(col("ship_mon") < EvCutoverMon)
            .select(col("ship_mon"), col("l_returnflag"), col("price_cents")),
          li.filter(col("ship_mon") >= EvCutoverMon)
            .select(col("ship_mon"), col("l_returnflag"),
              col("price_cents").as("extended_cents"), col("disc_bp")),
          "graft_wh_lineitem_se", "ship_mon")
        schemaEvolvedFor = dir
      }
    }

  /** Build-once guard for s15's merge-on-read pair (same pattern as
    * [[ensureBucketed]]): base = every customer at seq 0 plus a
    * re-insert generation (every third key, bumped payload) at seq
    * 10¹⁰ — AFTER every tombstone; tombstones = one (key, orderkey)
    * row per ninth order. Both key-bucketed at the same width, the
    * layout under which the merged read plans zero exchanges.
    */
  @volatile private var morFor: String = null
  private def ensureMergeOnRead(s: SparkSession, dir: String): Unit =
    synchronized {
      if (morFor != dir) {
        val t = Tables(s, dir)
        val gen0 = t.customer.select(col("c_custkey").as("k"),
          lit(0L).as("seq"), cents(col("c_acctbal")).as("acct_cents"),
          col("c_mktsegment").as("segment"))
        val gen1 = t.customer.filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey").as("k"), lit(10000000000L).as("seq"),
            (cents(col("c_acctbal")) + 1).as("acct_cents"),
            col("c_mktsegment").as("segment"))
        val dels = t.orders.filter(col("o_orderkey") % 9 === 0)
          .select(col("o_custkey").as("k"),
            col("o_orderkey").cast("long").as("seq"))
        val buckets = graft.operators.Iteration.roundPartitions(
          s, t.customer.count())
        graft.sources.MergeOnRead.stageBucketed(
          gen0.unionByName(gen1), dels,
          "graft_mor_base", "graft_mor_dels", "k", buckets)
        morFor = dir
      }
    }

  /** Build-once guard for s03's z-ordered lineitem slice (same pattern
    * as [[ensureBucketed]]).
    */
  @volatile private var zorderedFor: String = null
  private def ensureZOrdered(s: SparkSession, dir: String): Unit =
    synchronized {
      if (zorderedFor != dir) {
        graft.sources.ZOrder.writeZOrdered(
          Tables(s, dir).lineitem.select("l_partkey", "l_suppkey",
            "l_returnflag", "l_extendedprice", "l_discount"),
          "graft_wh_lineitem_z", "l_partkey", "l_suppkey",
          ZCellX, ZCellY, ZTb)
        zorderedFor = dir
      }
    }

  /** Build-once guard for s09's compacted layout (same pattern as
    * [[ensureBucketed]]): lineitem rewritten key-range-contiguous +
    * sorted + row-bounded on the ship day — the EXECUTION of the
    * maintenance pass s04 plans. ~100k-row target at sf0.1 → ~6 files.
    */
  @volatile private var compactedFor: String = null
  private def ensureCompacted(s: SparkSession, dir: String): Unit =
    synchronized {
      if (compactedFor != dir) {
        graft.sources.Compaction.compactSorted(
          Tables(s, dir).lineitem.select(
            datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
              .cast("long").as("ship_day"),
            col("l_orderkey"), col("l_returnflag"),
            col("l_extendedprice")),
          "graft_wh_lineitem_compact", "ship_day", targetRows = 100000L)
        compactedFor = dir
      }
    }

  /** The shared CDC pair of s06/s10/s12/s13: customer as the snapshot,
    * orders as the changelog (13-multiple orderkeys insert NEW customer
    * keys, 11-multiples delete, highest orderkey per key wins).
    */
  private def cdcSnap(t: Tables): DataFrame =
    t.customer.select(col("c_custkey").as("k"),
      cents(col("c_acctbal")).as("acct_cents"),
      col("c_mktsegment").as("segment"))

  private def cdcChangelog(t: Tables): DataFrame =
    t.orders.select(
      when(col("o_orderkey") % 13 === 0, col("o_custkey") + 1000000L)
        .otherwise(col("o_custkey")).as("k"),
      col("o_orderkey").as("seq"),
      when(col("o_orderkey") % 11 === 0, "D").otherwise("U").as("op"),
      cents(col("o_totalprice")).as("acct_cents"),
      col("o_orderpriority").as("segment"))

  /** Build-once guard for s13's materialized base view (same pattern as
    * [[ensureBucketed]]): the per-segment (count, balance) aggregate of
    * the snapshot, stored in the warehouse — what a real deployment
    * would have published at snapshot time. The timed query then does
    * ONLY increment work: the base table is probed, never re-aggregated.
    */
  @volatile private var ivmBaseFor: String = null
  private def ensureIvmBase(s: SparkSession, dir: String): Unit =
    synchronized {
      if (ivmBaseFor != dir) {
        Warehouse.writeTable(
          cdcSnap(Tables(s, dir)).groupBy(col("segment"))
            .agg(count(lit(1)).as("n_rows"),
              sum(col("acct_cents")).as("acct_total_cents")),
          "graft_wh_ivm_base_seg")
        ivmBaseFor = dir
      }
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Skew.saltedJoin over lineitem ⋈ supplier (supplier is small but the
    // point is the rewrite, not the size): per-supplier-nation revenue.
    // The oracle runs the unsalted join — hash equality proves the salt
    // fan-out/replication changes nothing.
    "s01_salted_supplier_revenue" -> { (s, dir) =>
      val t = Tables(s, dir)
      val big = t.lineitem.select(col("l_suppkey").as("suppkey"),
        col("l_extendedprice"), col("l_discount"))
      val small = t.supplier.select(col("s_suppkey").as("suppkey"),
        col("s_nationkey"))
      Skew.saltedJoin(big, small, "suppkey", salts = 8)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_items"),
          (sum(cents(col("l_extendedprice")) *
            (lit(100) - cents(col("l_discount")))).cast("double") / 10000)
            .as("revenue"))
        .orderBy(col("s_nationkey"))
    },

    // Warehouse round-trip: bucket-write orders + customer by custkey
    // ONCE per (JVM, sfDir) — the at-rest index-build pattern of v11/
    // v12/v14 — then join the bucketed tables (exchange-free SMJ per
    // WarehouseSpec) and roll up per market segment. The first call
    // (Verify; the bench's untimed warmup pass) pays the build and
    // checks the sink — a corrupted bucketed write would hash-mismatch —
    // while a timed pass measures the PROBE, which is what recurs at
    // 100 TB (the build is a once-amortized cost, and the DuckDB oracle
    // mirror runs only the join; timing build+probe against it was
    // measurement conflation, not engine cost).
    "s02_bucketed_segment_rollup" -> { (s, dir) =>
      ensureBucketed(s, dir)
      Warehouse.read(s, "graft_wh_orders")
        .join(Warehouse.read(s, "graft_wh_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          (sum(cents(col("o_totalprice"))).cast("double") / 100)
            .as("sum_total"))
        .orderBy(col("c_mktsegment"))
    },

    // Z-order layout probe: lineitem clustered by the Morton bucket of
    // (l_partkey, l_suppkey) — written once per (JVM, sfDir) like s02 —
    // then a 2-D box predicate (partkey ≤ 1279 × suppkey ≤ 63 → 1 of 64 cells, non-empty at every SF)
    // prunes to the box's Morton cells at PLANNING time (driver-derived
    // `zb IN (…)` literals) before the exact filter. Revenue rollup per
    // returnflag; the oracle runs the same box on the raw table —
    // layout must never change the answer (ZOrderSpec pins the
    // pruned-partition count).
    "s03_zorder_box_revenue" -> { (s, dir) =>
      ensureZOrdered(s, dir)
      graft.sources.ZOrder.readBox(s, "graft_wh_lineitem_z",
          "l_partkey", "l_suppkey", 0L, 1279L, 0L, 63L,
          ZCellX, ZCellY, ZTb)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          (sum(cents(col("l_extendedprice")) *
            (lit(100) - cents(col("l_discount")))).cast("double") / 10000)
            .as("revenue"))
        .orderBy(col("l_returnflag"))
    },

    // Zone-map range probe: revenue per returnflag over a 47-day
    // ship-date window. The reader consults the per-file (ship-month)
    // min/max day stats at PLANNING time and opens only the 2-3 files
    // whose range intersects — file skipping on DATA statistics
    // (ZoneMap doc; ZoneMapSpec pins the partitions-read count). The
    // oracle runs the same predicate on the raw table: the layout
    // detour must never change the answer.
    "s05_zonemap_range_revenue" -> { (s, dir) =>
      ensureZoneMapped(s, dir)
      graft.sources.ZoneMap.readRange(s, "graft_wh_lineitem_zm",
          "ship_mon", "ship_day", ZmLo, ZmHi)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          (sum(cents(col("l_extendedprice")) *
            (lit(100) - cents(col("l_discount")))).cast("double") / 10000)
            .as("revenue"))
        .orderBy(col("l_returnflag"))
    },

    // Compaction PLANNER — the small-files maintenance pass every
    // 100 TB warehouse runs: treat each (returnflag, ship-month) slice
    // as one "file" whose size is its row count, and next-fit-pack the
    // months IN CALENDAR ORDER per flag into ~5000-row target bins
    // (order-preserving packing keeps the table's time-clustering, so
    // compacted files still prune on date predicates — packing by
    // descending size would destroy that). One aggregate collapses the
    // table to file-level stats (map-side combined; the only
    // data-scale pass), then the p09 streaming fold packs the tiny
    // manifest. Output = the bin manifest a compactor would execute.
    "s04_compaction_plan" -> { (s, dir) =>
      val files = Tables(s, dir).lineitem
        .groupBy(col("l_returnflag").as("flag"),
          (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
            .cast("long").as("mon"))
        .agg(count(lit(1)).as("rows"))
      graft.operators.Packing
        .nextFitPack(files, "flag", "mon", "rows", budget = 5000L)
        .groupBy(col("flag"), col("seq_id").as("bin"))
        .agg(count(lit(1)).as("n_files"), sum(col("rows")).as("bin_rows"),
          min(col("mon")).as("first_mon"), max(col("mon")).as("last_mon"))
        .orderBy(col("flag"), col("bin"))
    },

    // Partition-evolution read (sources/Evolution doc): a day-range
    // revenue probe spanning the 1996-01 cutover — months prune the
    // history generation, weeks prune the new one, both at planning
    // time (ZoneMapSpec-style pin), and the union carries the exact
    // residual. The oracle is the raw-table mirror: generation routing
    // is a plan property, never a result change.
    "s08_evolved_range_revenue" -> { (s, dir) =>
      ensureEvolved(s, dir)
      def monOf(day: Long) = {
        val d = java.time.LocalDate.ofEpochDay(day)
        d.getYear * 100L + d.getMonthValue
      }
      graft.sources.Evolution.readRange(s, "graft_wh_lineitem_ev",
          "ship_mon", "ship_week", "ship_day", EvLo, EvHi,
          coarseLo = monOf(EvLo), coarseHi = monOf(EvHi),
          fineLo = EvLo / 7, fineHi = EvHi / 7)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          (sum(cents(col("l_extendedprice")) *
            (lit(100) - cents(col("l_discount")))).cast("double") / 10000)
            .as("revenue"))
        .orderBy(col("l_returnflag"))
    },

    // Bloom-at-rest point lookup (sources/BloomSkip doc): fetch one
    // order's line items from month-partitioned files by consulting
    // per-file membership bitmaps — the key is layout-independent, so
    // s05's zone maps would prune nothing here. Probe key = MIN
    // orderkey (one metadata-scale action; exists at every SF). The
    // oracle is the raw-table mirror: pruning is a plan property
    // (WarehouseSpec-style pin in ZoneMapSpec), never a result change.
    "s07_bloom_point_lookup" -> { (s, dir) =>
      ensureBloomSkip(s, dir)
      val key = Tables(s, dir).lineitem
        .agg(min(col("l_orderkey"))).collect()(0).getLong(0)
      graft.sources.BloomSkip.readPoint(s, "graft_wh_lineitem_bs",
          "ship_mon", "l_orderkey", lit(key))
        .select(col("l_orderkey"), col("ship_mon"), col("l_linenumber"),
          col("l_returnflag"), col("price_cents"))
        .orderBy(col("ship_mon"), col("l_linenumber"), col("l_returnflag"),
          col("price_cents"))
    },

    // Lakehouse MERGE: fold an orders-derived CDC changelog (13-multiple
    // orderkeys insert NEW customer keys, 11-multiples delete, highest
    // orderkey per key wins) into the customer snapshot
    // (SnapshotDiff.applyChangelog doc: compact the increment first,
    // then one full-outer key join — snapshot moves once, or not at all
    // when key-bucketed at rest).
    "s06_changelog_apply" -> { (s, dir) =>
      val t = Tables(s, dir)
      graft.operators.SnapshotDiff
        .applyChangelog(cdcSnap(t), cdcChangelog(t), "k", "seq", "op",
          Seq("acct_cents", "segment"))
        .orderBy(col("k"))
    },

    // Compaction EXECUTION (sources/Compaction doc) — s04 plans the
    // bins; this rewrites the table (range-contiguous + sorted +
    // row-bounded files) and PROVES the rewrite lossless: an
    // order-free content checksum per returnflag over the COMPACTED
    // table, mirrored by the oracle over the RAW table — equality
    // means the multiset survived the rewrite. The layout contracts
    // (per-file row bound, non-overlapping sorted ranges, tight
    // row-group stats) are CompactionSpec's to pin; a checksum term
    // is (cents % 9973)·(orderkey % 997 + 1): content-sensitive,
    // commutative, and bounded so the sum stays in long range at any
    // SF under ANSI mode.
    "s09_compaction_exec" -> { (s, dir) =>
      ensureCompacted(s, dir)
      Warehouse.read(s, "graft_wh_lineitem_compact")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          sum((cents(col("l_extendedprice")) % 9973) *
            (col("l_orderkey") % 997 + 1)).as("checksum"),
          min(col("ship_day")).as("first_day"),
          max(col("ship_day")).as("last_day"))
        .orderBy(col("l_returnflag"))
    },

    // TIME TRAVEL (SnapshotDiff.statesAt): read the s06 snapshot+
    // changelog AS OF three versions (¼, ½, full of the max sequence)
    // in ONE changelog pass + ONE snapshot join — the lakehouse
    // as-of-read audit (row count + balance total + segment spread per
    // version). The cutoffs derive from max(o_orderkey) by integer
    // division on both engines, so they are scale-free scalars, not
    // baked literals.
    // RETENTION VACUUM planning (sources/Vacuum): synthetic manifest
    // from orders (file per order, partitioned by priority; %7 files
    // removed by a later rewrite at seq+1000), retention cutoff at
    // maxSeq/2 — per partition, what physical delete reclaims vs what
    // stays live. The cutoff derives from max(o_orderkey) (integer
    // division both engines, the s10 scalar doctrine).
    "s11_vacuum_plan" -> { (s, dir) =>
      val t = Tables(s, dir)
      val manifest = t.orders.select(
        col("o_orderkey").as("file_id"),
        col("o_orderpriority").as("part"),
        cents(col("o_totalprice")).as("bytes"),
        col("o_orderkey").as("added_seq"),
        when(col("o_orderkey") % 7 === 0, col("o_orderkey") + 1000L)
          .as("removed_seq"))
      val maxSeq = t.orders.agg(max(col("o_orderkey")))
        .collect()(0).getLong(0)
      graft.sources.Vacuum
        .plan(manifest, "part", "bytes", "removed_seq",
          retainFrom = maxSeq / 2)
        .orderBy(col("part"))
    },

    "s10_time_travel" -> { (s, dir) =>
      val t = Tables(s, dir)
      val maxSeq = t.orders.agg(max(col("o_orderkey")))
        .collect()(0).getLong(0)
      val cuts = Seq(maxSeq / 4, maxSeq / 2, maxSeq)
      graft.operators.SnapshotDiff
        .statesAt(cdcSnap(t), cdcChangelog(t), "k", "seq", "op",
          Seq("acct_cents", "segment"), cuts)
        .groupBy(col("version"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("acct_cents")).as("acct_total_cents"),
          countDistinct(col("segment")).as("n_segments"))
        .orderBy(col("version"))
    },

    // SCD TYPE-2 (SnapshotDiff.scd2): the full version history of the
    // s06 CDC pair — every customer version with its validity interval.
    // valid_to is surfaced as coalesce(-1) and is_current as 0/1 longs
    // so the cross-engine compare never hinges on null/bool dtype
    // coercion. snapshotSeq = -1: the changelog's seq domain is
    // o_orderkey, which INCLUDES 0 in the testdata, and the scd2 guard
    // (round 12) rightly rejects a changelog event tying the synthetic
    // snapshot opening — the snapshot must predate every event.
    "s12_scd2_build" -> { (s, dir) =>
      val t = Tables(s, dir)
      graft.operators.SnapshotDiff
        .scd2(cdcSnap(t), cdcChangelog(t), "k", "seq", "op",
          Seq("acct_cents", "segment"), snapshotSeq = -1L)
        .select(col("k"), col("acct_cents"), col("segment"),
          col("valid_from"), coalesce(col("valid_to"), lit(-1L))
            .as("valid_to"),
          col("is_current").cast("long").as("is_current"))
        .orderBy(col("k"), col("valid_from"))
    },

    // INCREMENTAL VIEW MAINTENANCE (operators/Ivm): refresh the stored
    // per-segment (count, balance) view under the s06 changelog without
    // re-aggregating the base table — retraction+insertion deltas from
    // the compacted increment, merged into the materialized view the
    // build-once guard published. The oracle recomputes the view from
    // the FINAL state (apply changelog, then aggregate): hash equality
    // proves the delta algebra reaches recompute's answer while scanning
    // only the increment.
    "s13_ivm_delta" -> { (s, dir) =>
      ensureIvmBase(s, dir)
      val t = Tables(s, dir)
      graft.operators.Ivm
        .maintainSumCount(Warehouse.read(s, "graft_wh_ivm_base_seg"),
          cdcSnap(t), cdcChangelog(t), "k", "seq", "op",
          "segment", "acct_cents",
          nCol = "n_rows", sumCol = "acct_total_cents")
        .orderBy(col("segment"))
    },

    // Schema-evolution read (sources/Evolution.readEvolvedSchema): one
    // logical lineitem slice across two file generations — history
    // written pre-evolution (price_cents, no discount column), the
    // current generation with the column RENAMED (extended_cents) and
    // one ADDED (disc_bp). The read presents both under the current
    // schema via the name mapping; added-column values are typed NULLs
    // for history rows — visible in the hash as NULL sums for
    // pre-cutover months. The month filter prunes BOTH generations at
    // planning time (ZoneMapSpec pin); the oracle is the raw-table
    // mirror with the cutover CASE — schema routing never changes rows.
    // Merge-on-read deletes (sources/MergeOnRead doc): tombstone files
    // applied at read time over a never-rewritten base — the Iceberg v2
    // equality-delete face, complementing s06's copy-on-write MERGE.
    // Sequence semantics in the hash: keys deleted by a tombstone
    // vanish UNLESS re-inserted at a later seq (the gen-10¹⁰ rows).
    // Both sides key-bucketed → the merged read plans ZERO exchanges
    // up to the final rollup (MergeOnReadSpec pin).
    "s15_merge_on_read" -> { (s, dir) =>
      ensureMergeOnRead(s, dir)
      graft.sources.MergeOnRead.read(s, "graft_mor_base",
          "graft_mor_dels", "k", "seq")
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("acct_cents")).as("acct_total_cents"))
        .orderBy(col("segment"))
    },

    "s14_schema_evolution_read" -> { (s, dir) =>
      ensureSchemaEvolved(s, dir)
      graft.sources.Evolution.readEvolvedSchema(s, "graft_wh_lineitem_se",
          Map("price_cents" -> "extended_cents"))
        .filter(col("ship_mon").between(SeLo, SeHi))
        .groupBy(col("ship_mon"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("extended_cents")).as("sum_cents"),
          sum(col("disc_bp")).as("sum_disc_bp"))
        .orderBy(col("ship_mon"))
    },

    // PARTITION BACKFILL (sources/Backfill): the monthly revenue rollup
    // is first built from a STALE source (the earliest ship-month sees
    // only its first line items — a simulated partial drop), then that
    // one month is re-computed from the full source and dynamic
    // partition overwrite replaces ONLY its directory. The hash equals
    // the clean full recompute — proof the backfill landed AND that no
    // other partition was disturbed (a static-mode truncate or a sloppy
    // overwrite would corrupt the other months' rows in the hash);
    // BackfillSpec additionally pins untouched-files-byte-identical.
    // The stale month derives from min(l_shipdate) — scale-free scalar.
    "s18_partition_backfill" -> { (s, dir) =>
      import graft.sources.Backfill
      val li = Tables(s, dir).lineitem.select(
        (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
          .cast("long").as("ship_mon"),
        col("l_linenumber"),
        cents(col("l_extendedprice")).as("price_cents"))
      val staleMon = li.agg(min(col("ship_mon"))).collect()(0).getLong(0)
      def rollup(src: org.apache.spark.sql.DataFrame) = src
        .groupBy(col("ship_mon"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("price_cents")).as("sum_cents"))
      // v1: the stale build — the earliest month only saw linenumber 1
      Warehouse.writePartitioned(
        rollup(li.filter(col("ship_mon") =!= staleMon ||
          col("l_linenumber") === 1)),
        "graft_backfill_rollup", Seq("ship_mon"))
      // the backfill: recompute exactly the stale month from the full
      // source; dynamic overwrite touches only its partition directory
      Backfill.overwritePartitions(
        rollup(li.filter(col("ship_mon") === staleMon)),
        "graft_backfill_rollup")
      Warehouse.read(s, "graft_backfill_rollup")
        .select(col("ship_mon"), col("n_items"), col("sum_cents"))
        .orderBy(col("ship_mon"))
    },

    // SHALLOW CLONE (sources/Clone): zero-copy snapshot + divergent
    // evolution — the clone is a manifest of the base's files at clone
    // time plus its own delta (O(files) to create, no data copied).
    // After cloning, the CLONE receives the %10=7 slice and the BASE
    // receives the %10=8 slice: the hash proves snapshot isolation in
    // both directions (base grew without the 7s, the clone reads the
    // original snapshot plus the 7s and never sees the 8s appended to
    // the base after the clone).
    "s17_shallow_clone" -> { (s, dir) =>
      import graft.sources.Clone
      val o = Tables(s, dir).orders.select(col("o_orderkey"),
        cents(col("o_totalprice")).as("price_cents"))
      Warehouse.writeTable(o.filter(col("o_orderkey") % 10 < 5),
        "graft_clone_base")
      Clone.shallowClone(s, "graft_clone_base", "graft_clone_c1")
      Clone.appendToClone(o.filter(col("o_orderkey") % 10 === 7),
        "graft_clone_c1")
      Warehouse.appendPartitioned(o.filter(col("o_orderkey") % 10 === 8),
        "graft_clone_base")
      val base = Warehouse.read(s, "graft_clone_base")
        .select(lit("base").as("side"), col("o_orderkey"),
          col("price_cents"))
      val clone = Clone.readClone(s, "graft_clone_c1")
        .select(lit("clone").as("side"), col("o_orderkey"),
          col("price_cents"))
      base.unionByName(clone)
        .groupBy(col("side"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("price_cents")).as("sum_cents"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("side"))
    },

    // s19 — SNAPSHOT ROLLBACK (sources/Versioned): the lifecycle verb
    // the maintenance family lacked — undo a bad commit zero-copy,
    // history intact. Five-version history: three commits, a rollback
    // to v2 (v4 — same file list, no data movement, VersionedSpec pins
    // the byte-set), then a post-rollback commit (v5 diverges from v3:
    // nothing resurrects). Probe = every version's (rows, cents) read
    // through its own manifest. Mirror asymmetry, stated (the v27/s17
    // adjudication class): the timed body performs the commits +
    // rollbacks + five manifested reads; the oracle is a probe-only
    // mirror of the version CONTENTS (slices/unions) — the rollback
    // contracts themselves are VersionedSpec pins, not ratio claims.
    "s19_snapshot_rollback" -> { (s, dir) =>
      import graft.sources.Versioned
      val c = Tables(s, dir).customer.select(col("c_custkey"),
        cents(col("c_acctbal")).as("acct_cents"))
      val t = "graft_vroll"
      Versioned.create(s, c.filter(col("c_custkey") % 3 === 0), t)
      Versioned.commitAppend(s, c.filter(col("c_custkey") % 3 === 1), t)
      Versioned.commitAppend(s, c.filter(col("c_custkey") % 3 === 2), t)
      Versioned.rollbackTo(s, t, 2L)
      Versioned.commitAppend(s, c.filter(col("c_custkey") % 10 === 5), t)
      (1 to 5).map(v => Versioned.readVersion(s, t, v.toLong)
          .agg(count(lit(1)).as("n_rows"),
            sum(col("acct_cents")).as("acct_total_cents"))
          .select(lit(v).as("version"), col("n_rows"),
            col("acct_total_cents")))
        .reduce(_ unionByName _)
        .orderBy(col("version"))
    },

    // WRITE–AUDIT–PUBLISH (sources/Wap): the ingestion data-quality
    // gate. A base table is staged, then two candidate batches run the
    // gate: batch 'b' (clean orders slice) passes all expectations and
    // PUBLISHES; batch 'c' (the same shape with custkeys poisoned NULL
    // on a 1-in-97 stripe) fails the null-rate expectation and ABORTS
    // without landing a byte. Output = both audit frames plus a
    // '__publish' row per batch whose observed value is the table's
    // row count AFTER that batch's attempt — so the hash proves BOTH
    // the audit arithmetic and the abort semantics (c's count equals
    // b's: nothing from c landed). Each expectation is one aggregate
    // column of a single audit pass; the publish decision reads the
    // bounded audit frame only.
    "s16_wap_publish" -> { (s, dir) =>
      import graft.sources.Wap
      val o = Tables(s, dir).orders
        .select(col("o_orderkey"), col("o_custkey"),
          cents(col("o_totalprice")).as("price_cents"))
      Warehouse.writeTable(o.filter(col("o_orderkey") % 10 < 3),
        "graft_wap_orders")
      val batchB = o.filter(col("o_orderkey") % 10 === 7)
      val batchC = o.filter(col("o_orderkey") % 10 === 3)
        .withColumn("o_custkey",
          when(col("o_orderkey") % 97 === 0, lit(null).cast("long"))
            .otherwise(col("o_custkey")))
      val expects = Seq(
        Wap.Expect("null_custkey",
          sum(when(col("o_custkey").isNull, 1L).otherwise(0L)), 0L, 0L),
        Wap.Expect("nonpositive_price",
          sum(when(col("price_cents") <= 0, 1L).otherwise(0L)), 0L, 0L),
        Wap.Expect("row_count", count(lit(1)), 1L, Long.MaxValue),
        Wap.Expect("max_price_cents", max(col("price_cents")),
          1L, 100000000L))
      // run sequentially: b publishes, c aborts — c's '__publish'
      // observed count must equal b's (the abort proof)
      val ab = Wap.audit(batchB, expects).localCheckpoint()
      val pubB = Wap.publishIfClean(batchB, ab, "graft_wap_orders")
      val afterB = Warehouse.read(s, "graft_wap_orders").count()
      val ac = Wap.audit(batchC, expects).localCheckpoint()
      val pubC = Wap.publishIfClean(batchC, ac, "graft_wap_orders")
      val afterC = Warehouse.read(s, "graft_wap_orders").count()
      def rows(name: String, a: DataFrame, after: Long, pub: Boolean) =
        a.select(lit(name).as("batch"), col("expectation"),
            col("observed"), col("lo"), col("hi"), col("passed"))
          .unionByName(a.sparkSession.range(1).select(
            lit(name).as("batch"), lit("__publish").as("expectation"),
            lit(after).as("observed"), lit(0L).as("lo"), lit(0L).as("hi"),
            lit(if (pub) 1L else 0L).as("passed")))
      rows("b", ab, afterB, pubB)
        .unionByName(rows("c", ac, afterC, pubC))
        .orderBy(col("batch"), col("expectation"))
    }
  )

  def oracle: Map[String, String] = Map(
    "s01_salted_supplier_revenue" ->
      """SELECT s_nationkey, COUNT(*) AS n_items,
        | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
        |   * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000
        |   AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "s02_bucketed_segment_rollup" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100
        |   AS sum_total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // the raw-table box — the z-order detour through storage must not
    // change the answer, only the scan width
    "s03_zorder_box_revenue" ->
      """SELECT l_returnflag, COUNT(*) AS n_items,
        | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
        |   * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000
        |   AS revenue
        |FROM lineitem
        |WHERE l_partkey BETWEEN 0 AND 1279
        |  AND l_suppkey BETWEEN 0 AND 63
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // the raw-table range — layout + stats must not change the answer
    "s05_zonemap_range_revenue" ->
      s"""SELECT l_returnflag, COUNT(*) AS n_items,
         | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
         |   * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000
         |   AS revenue
         |FROM lineitem
         |WHERE CAST(l_shipdate AS DATE) - DATE '1970-01-01'
         |      BETWEEN $ZmLo AND $ZmHi
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // month-file rollup, then the p09 walk pattern (one recursion step
    // per file per flag, carrying the running fill)
    "s04_compaction_plan" ->
      """WITH RECURSIVE f AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(year(l_shipdate)*100 + month(l_shipdate) AS BIGINT) AS mon,
        |    COUNT(*) AS nr
        |  FROM lineitem GROUP BY 1, 2),
        |o AS (SELECT flag, mon, nr,
        |        row_number() OVER (PARTITION BY flag ORDER BY mon) AS rn
        |      FROM f),
        |walk(flag, rn, mon, nr, filled, seq) AS (
        |  SELECT flag, rn, mon, nr, nr, CAST(0 AS BIGINT)
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.flag, o.rn, o.mon, o.nr,
        |    CASE WHEN w.filled > 0 AND w.filled + o.nr > 5000
        |         THEN o.nr ELSE w.filled + o.nr END,
        |    CASE WHEN w.filled > 0 AND w.filled + o.nr > 5000
        |         THEN w.seq + 1 ELSE w.seq END
        |  FROM walk w JOIN o ON o.flag = w.flag AND o.rn = w.rn + 1)
        |SELECT flag, seq AS bin, COUNT(*) AS n_files,
        | CAST(SUM(nr) AS BIGINT) AS bin_rows,
        | MIN(mon) AS first_mon, MAX(mon) AS last_mon
        |FROM walk GROUP BY flag, seq ORDER BY flag, bin""".stripMargin,

    "s08_evolved_range_revenue" ->
      s"""SELECT l_returnflag, COUNT(*) AS n_items,
         | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
         |   * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000
         |   AS revenue
         |FROM lineitem
         |WHERE CAST(l_shipdate AS DATE) - DATE '1970-01-01'
         |      BETWEEN $EvLo AND $EvHi
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "s07_bloom_point_lookup" ->
      """SELECT l_orderkey,
        | CAST(year(l_shipdate)*100 + month(l_shipdate) AS BIGINT)
        |   AS ship_mon,
        | l_linenumber, l_returnflag,
        | CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents
        |FROM lineitem
        |WHERE l_orderkey = (SELECT MIN(l_orderkey) FROM lineitem)
        |ORDER BY ship_mon, l_linenumber, l_returnflag, price_cents"""
      .stripMargin,

    "s06_changelog_apply" ->
      """WITH snap AS (
        |  SELECT c_custkey AS k,
        |    CAST(round(c_acctbal*100) AS BIGINT) AS acct_cents,
        |    c_mktsegment AS segment
        |  FROM customer),
        |cl AS (
        |  SELECT CASE WHEN o_orderkey % 13 = 0 THEN o_custkey + 1000000
        |              ELSE o_custkey END AS k,
        |    o_orderkey AS seq,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 'D' ELSE 'U' END AS op,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS acct_cents,
        |    o_orderpriority AS segment
        |  FROM orders),
        |latest AS (
        |  SELECT k, op, acct_cents, segment FROM (
        |    SELECT cl.*, row_number() OVER (PARTITION BY k
        |      ORDER BY seq DESC, op) AS rn FROM cl)
        |  WHERE rn = 1)
        |SELECT COALESCE(s.k, l.k) AS k,
        |  CASE WHEN l.op = 'U' THEN l.acct_cents
        |       ELSE s.acct_cents END AS acct_cents,
        |  CASE WHEN l.op = 'U' THEN l.segment ELSE s.segment END AS segment
        |FROM snap s FULL OUTER JOIN latest l ON s.k = l.k
        |WHERE l.op IS NULL OR l.op = 'U'
        |ORDER BY k""".stripMargin,

    // raw-table mirror of the compacted-table checksum rollup: equality
    // proves the compaction rewrite preserved the multiset
    "s09_compaction_exec" ->
      """SELECT l_returnflag, COUNT(*) AS n_rows,
        | CAST(SUM((CAST(round(l_extendedprice*100) AS BIGINT) % 9973)
        |   * (l_orderkey % 997 + 1)) AS BIGINT) AS checksum,
        | MIN(CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS first_day,
        | MAX(CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS last_day
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // mirrors Vacuum.plan: deletable iff removed_seq <= maxSeq/2
    // (NULL removed = live in the current snapshot, never deletable)
    "s11_vacuum_plan" ->
      """WITH m AS (
        |  SELECT o_orderpriority AS part,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS bytes,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_orderkey + 1000
        |         END AS removed_seq
        |  FROM orders),
        |cut AS (SELECT MAX(o_orderkey) // 2 AS rf FROM orders)
        |SELECT part,
        | CAST(SUM(CASE WHEN removed_seq IS NOT NULL AND removed_seq <= rf
        |               THEN 1 ELSE 0 END) AS BIGINT) AS n_deletable,
        | CAST(SUM(CASE WHEN removed_seq IS NOT NULL AND removed_seq <= rf
        |               THEN bytes ELSE 0 END) AS BIGINT) AS reclaim_bytes,
        | CAST(SUM(CASE WHEN removed_seq IS NULL OR removed_seq > rf
        |               THEN 1 ELSE 0 END) AS BIGINT) AS n_live,
        | CAST(SUM(CASE WHEN removed_seq IS NULL OR removed_seq > rf
        |               THEN bytes ELSE 0 END) AS BIGINT) AS live_bytes
        |FROM m CROSS JOIN cut
        |GROUP BY part ORDER BY part""".stripMargin,

    // mirrors SnapshotDiff.scd2 over the s06 CDC pair: snapshot rows are
    // seq-0 'U' events; a version's valid_to is the key's next event of
    // any op; D rows close without opening
    "s12_scd2_build" ->
      """WITH snap AS (
        |  SELECT c_custkey AS k,
        |    CAST(round(c_acctbal*100) AS BIGINT) AS acct_cents,
        |    c_mktsegment AS segment
        |  FROM customer),
        |cl AS (
        |  SELECT CASE WHEN o_orderkey % 13 = 0 THEN o_custkey + 1000000
        |              ELSE o_custkey END AS k,
        |    o_orderkey AS seq,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 'D' ELSE 'U' END AS op,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS acct_cents,
        |    o_orderpriority AS segment
        |  FROM orders),
        |ev AS (
        |  SELECT k, CAST(-1 AS BIGINT) AS seq, 'U' AS op, acct_cents,
        |    segment FROM snap
        |  UNION ALL
        |  SELECT k, seq, op, acct_cents, segment FROM cl),
        |v AS (
        |  SELECT k, seq, op, acct_cents, segment,
        |    LEAD(seq) OVER (PARTITION BY k ORDER BY seq) AS vto
        |  FROM ev)
        |SELECT k, acct_cents, segment, seq AS valid_from,
        |  COALESCE(vto, -1) AS valid_to,
        |  CAST(CASE WHEN vto IS NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_current
        |FROM v WHERE op = 'U' ORDER BY k, valid_from""".stripMargin,

    // recompute-from-final-state mirror of the s13 delta refresh: apply
    // the changelog (the s06 CTE chain), then aggregate per segment
    // raw-table mirror of the merge-on-read semantics: max tombstone per
    // key, base row survives iff no tombstone or seq strictly greater
    "s15_merge_on_read" ->
      """WITH base AS (
        |  SELECT c_custkey AS k, CAST(0 AS BIGINT) AS seq,
        |         CAST(round(c_acctbal*100) AS BIGINT) AS acct_cents,
        |         c_mktsegment AS segment
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, CAST(10000000000 AS BIGINT),
        |         CAST(round(c_acctbal*100) AS BIGINT) + 1, c_mktsegment
        |  FROM customer WHERE c_custkey % 3 = 0),
        |dels AS (
        |  SELECT o_custkey AS k, CAST(MAX(o_orderkey) AS BIGINT) AS del_seq
        |  FROM orders WHERE o_orderkey % 9 = 0 GROUP BY o_custkey),
        |m AS (
        |  SELECT b.* FROM base b LEFT JOIN dels d ON b.k = d.k
        |  WHERE d.del_seq IS NULL OR b.seq > d.del_seq)
        |SELECT segment, COUNT(*) AS n_rows,
        |  CAST(SUM(acct_cents) AS BIGINT) AS acct_total_cents
        |FROM m GROUP BY segment ORDER BY segment""".stripMargin,

    // the clean full-recompute mirror: the backfilled table must be
    // indistinguishable from never having been stale.
    // MIRROR ASYMMETRY, stated for the bench ratio (the v27
    // adjudication class): the engine's timed body is the full
    // partitioned build + the backfill overwrite + the read-back —
    // maintenance INCLUDED — while this mirror is a pure SELECT. The
    // ratio measures "maintenance ops vs one aggregate", not scan-vs-
    // scan; the operator's real claims (only the stale directory
    // rewritten, byte-identical elsewhere, idempotent) are
    // BackfillSpec-pinned, not ratio-argued.
    "s18_partition_backfill" ->
      """SELECT CAST(year(l_shipdate)*100 + month(l_shipdate) AS BIGINT)
        |         AS ship_mon,
        |       COUNT(*) AS n_items,
        |       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT))
        |         AS BIGINT) AS sum_cents
        |FROM lineitem
        |GROUP BY 1 ORDER BY ship_mon""".stripMargin,

    // MIRROR ASYMMETRY (the v27 adjudication class, same as s18): the
    // engine's timed body is base write + manifest + empty delta + two
    // divergent appends + the merged read — five metadata/table ops vs
    // this pure-SELECT mirror, so the ratio is scale-FLAT on both sides
    // and not a scan comparison. The operator's real claims (zero data
    // copied, snapshot isolation both directions) are CloneSpec-pinned.
    "s17_shallow_clone" ->
      """WITH o AS (SELECT o_orderkey,
        |             CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
        |           FROM orders)
        |SELECT side, COUNT(*) AS n_rows,
        |       CAST(SUM(price_cents) AS BIGINT) AS sum_cents,
        |       MAX(o_orderkey) AS max_key
        |FROM (
        |  SELECT 'base' AS side, * FROM o
        |  WHERE o_orderkey % 10 < 5 OR o_orderkey % 10 = 8
        |  UNION ALL
        |  SELECT 'clone', * FROM o
        |  WHERE o_orderkey % 10 < 5 OR o_orderkey % 10 = 7)
        |GROUP BY side ORDER BY side""".stripMargin,

    // probe-only mirror of the five version CONTENTS (see the query
    // comment for the stated timed-body asymmetry): v4 = v2 (the
    // rollback), v5 = v2 + the post-rollback commit.
    "s19_snapshot_rollback" ->
      """WITH c AS (SELECT c_custkey AS k,
        |             CAST(round(c_acctbal*100) AS BIGINT) AS acct_cents
        |           FROM customer),
        |v1 AS (SELECT * FROM c WHERE k % 3 = 0),
        |v2 AS (SELECT * FROM v1 UNION ALL
        |       SELECT * FROM c WHERE k % 3 = 1),
        |v3 AS (SELECT * FROM v2 UNION ALL
        |       SELECT * FROM c WHERE k % 3 = 2),
        |v5 AS (SELECT * FROM v2 UNION ALL
        |       SELECT * FROM c WHERE k % 10 = 5)
        |SELECT version, COUNT(*) AS n_rows,
        |       CAST(SUM(acct_cents) AS BIGINT) AS acct_total_cents
        |FROM (
        |  SELECT CAST(1 AS INT) AS version, * FROM v1
        |  UNION ALL SELECT 2, * FROM v2
        |  UNION ALL SELECT 3, * FROM v3
        |  UNION ALL SELECT 4, * FROM v2
        |  UNION ALL SELECT 5, * FROM v5)
        |GROUP BY version ORDER BY version""".stripMargin,

    "s16_wap_publish" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
        |             CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
        |           FROM orders),
        |base AS (SELECT * FROM o WHERE o_orderkey % 10 < 3),
        |b AS (SELECT * FROM o WHERE o_orderkey % 10 = 7),
        |c AS (SELECT o_orderkey,
        |        CASE WHEN o_orderkey % 97 = 0 THEN NULL
        |             ELSE o_custkey END AS o_custkey,
        |        price_cents
        |      FROM o WHERE o_orderkey % 10 = 3),
        |audit_b AS (
        |  SELECT 'b' AS batch, expectation, observed, lo, hi,
        |         CAST(CASE WHEN observed IS NOT NULL
        |              AND observed BETWEEN lo AND hi
        |              THEN 1 ELSE 0 END AS BIGINT) AS passed
        |  FROM (
        |   SELECT 'null_custkey' AS expectation,
        |     CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
        |       AS BIGINT) AS observed,
        |     CAST(0 AS BIGINT) AS lo, CAST(0 AS BIGINT) AS hi FROM b
        |   UNION ALL SELECT 'nonpositive_price',
        |     CAST(SUM(CASE WHEN price_cents <= 0 THEN 1 ELSE 0 END)
        |       AS BIGINT),
        |     0, 0 FROM b
        |   UNION ALL SELECT 'row_count', COUNT(*),
        |     1, CAST(9223372036854775807 AS BIGINT) FROM b
        |   UNION ALL SELECT 'max_price_cents', MAX(price_cents),
        |     1, 100000000 FROM b)),
        |audit_c AS (
        |  SELECT 'c' AS batch, expectation, observed, lo, hi,
        |         CAST(CASE WHEN observed IS NOT NULL
        |              AND observed BETWEEN lo AND hi
        |              THEN 1 ELSE 0 END AS BIGINT) AS passed
        |  FROM (
        |   SELECT 'null_custkey' AS expectation,
        |     CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
        |       AS BIGINT) AS observed,
        |     CAST(0 AS BIGINT) AS lo, CAST(0 AS BIGINT) AS hi FROM c
        |   UNION ALL SELECT 'nonpositive_price',
        |     CAST(SUM(CASE WHEN price_cents <= 0 THEN 1 ELSE 0 END)
        |       AS BIGINT),
        |     0, 0 FROM c
        |   UNION ALL SELECT 'row_count', COUNT(*),
        |     1, CAST(9223372036854775807 AS BIGINT) FROM c
        |   UNION ALL SELECT 'max_price_cents', MAX(price_cents),
        |     1, 100000000 FROM c)),
        |after_b AS (SELECT (SELECT COUNT(*) FROM base)
        |  + CASE WHEN (SELECT MIN(passed) FROM audit_b) = 1
        |         THEN (SELECT COUNT(*) FROM b) ELSE 0 END AS n),
        |after_c AS (SELECT (SELECT n FROM after_b)
        |  + CASE WHEN (SELECT MIN(passed) FROM audit_c) = 1
        |         THEN (SELECT COUNT(*) FROM c) ELSE 0 END AS n)
        |SELECT batch, expectation, observed, lo, hi, passed FROM (
        |  SELECT * FROM audit_b
        |  UNION ALL SELECT * FROM audit_c
        |  UNION ALL SELECT 'b', '__publish', CAST((SELECT n FROM after_b)
        |    AS BIGINT), 0, 0, (SELECT MIN(passed) FROM audit_b)
        |  UNION ALL SELECT 'c', '__publish', CAST((SELECT n FROM after_c)
        |    AS BIGINT), 0, 0, (SELECT MIN(passed) FROM audit_c))
        |ORDER BY batch, expectation""".stripMargin,

    // raw two-generation mirror: the discount column is NULL before the
    // cutover (it didn't exist in the old schema), so pre-cutover months
    // aggregate to NULL disc sums — the added-column contract, in the hash
    "s14_schema_evolution_read" ->
      s"""WITH li AS (
         |  SELECT CAST(year(l_shipdate)*100 + month(l_shipdate) AS BIGINT)
         |           AS ship_mon,
         |         CAST(round(l_extendedprice*100) AS BIGINT) AS cents,
         |         CASE WHEN CAST(year(l_shipdate)*100 + month(l_shipdate)
         |                        AS BIGINT) < $EvCutoverMon THEN NULL
         |              ELSE CAST(round(l_discount*10000) AS BIGINT) END AS bp
         |  FROM lineitem)
         |SELECT ship_mon, COUNT(*) AS n_items,
         |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
         |  CAST(SUM(bp) AS BIGINT) AS sum_disc_bp
         |FROM li WHERE ship_mon BETWEEN $SeLo AND $SeHi
         |GROUP BY ship_mon ORDER BY ship_mon""".stripMargin,

    "s13_ivm_delta" ->
      """WITH snap AS (
        |  SELECT c_custkey AS k,
        |    CAST(round(c_acctbal*100) AS BIGINT) AS acct_cents,
        |    c_mktsegment AS segment
        |  FROM customer),
        |cl AS (
        |  SELECT CASE WHEN o_orderkey % 13 = 0 THEN o_custkey + 1000000
        |              ELSE o_custkey END AS k,
        |    o_orderkey AS seq,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 'D' ELSE 'U' END AS op,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS acct_cents,
        |    o_orderpriority AS segment
        |  FROM orders),
        |latest AS (
        |  SELECT k, op, acct_cents, segment FROM (
        |    SELECT cl.*, row_number() OVER (PARTITION BY k
        |      ORDER BY seq DESC, op) AS rn FROM cl)
        |  WHERE rn = 1),
        |final AS (
        |  SELECT COALESCE(s.k, l.k) AS k,
        |    CASE WHEN l.op = 'U' THEN l.acct_cents
        |         ELSE s.acct_cents END AS acct_cents,
        |    CASE WHEN l.op = 'U' THEN l.segment ELSE s.segment END
        |      AS segment
        |  FROM snap s FULL OUTER JOIN latest l ON s.k = l.k
        |  WHERE l.op IS NULL OR l.op = 'U')
        |SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(acct_cents) AS BIGINT) AS acct_total_cents
        |FROM final GROUP BY segment ORDER BY segment""".stripMargin,

    // s06's snapshot+changelog, reconstructed at three cutoffs: winner
    // per (version, key) = max by (seq, op) among seq <= v, state =
    // U-winners ∪ untouched snapshot keys — the statesAt contract
    "s10_time_travel" ->
      """WITH snap AS (
        |  SELECT c_custkey AS k,
        |    CAST(round(c_acctbal*100) AS BIGINT) AS acct_cents,
        |    c_mktsegment AS segment
        |  FROM customer),
        |cl AS (
        |  SELECT CASE WHEN o_orderkey % 13 = 0 THEN o_custkey + 1000000
        |              ELSE o_custkey END AS k,
        |    o_orderkey AS seq,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 'D' ELSE 'U' END AS op,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS acct_cents,
        |    o_orderpriority AS segment
        |  FROM orders),
        |cuts AS (
        |  SELECT (SELECT MAX(o_orderkey) FROM orders) // 4 AS v
        |  UNION ALL
        |  SELECT (SELECT MAX(o_orderkey) FROM orders) // 2
        |  UNION ALL
        |  SELECT (SELECT MAX(o_orderkey) FROM orders)),
        |latest AS (
        |  SELECT v, k, op, acct_cents, segment FROM (
        |    SELECT c.v, cl.*, row_number() OVER (PARTITION BY c.v, cl.k
        |      ORDER BY cl.seq DESC, cl.op DESC) AS rn
        |    FROM cl JOIN cuts c ON cl.seq <= c.v)
        |  WHERE rn = 1),
        |state AS (
        |  SELECT v, k, acct_cents, segment FROM latest WHERE op = 'U'
        |  UNION ALL
        |  SELECT c.v, s.k, s.acct_cents, s.segment
        |  FROM cuts c, snap s
        |  WHERE NOT EXISTS (SELECT 1 FROM latest l
        |                    WHERE l.v = c.v AND l.k = s.k))
        |SELECT v AS version, COUNT(*) AS n_rows,
        |  CAST(SUM(acct_cents) AS BIGINT) AS acct_total_cents,
        |  COUNT(DISTINCT segment) AS n_segments
        |FROM state GROUP BY v ORDER BY version""".stripMargin
  )
}
