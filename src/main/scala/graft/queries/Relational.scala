package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Core relational operator coverage (SURVEY.md §2.3–§2.9) re-expressed over
  * the driver's star schema: scans with pushdown, multi-way joins
  * (broadcast + shuffle), semi/anti joins, exact aggregation, windows
  * (running sums, lag, row_number dedup/argmax), explode-of-sequence
  * generators, and unpivot.
  *
  * Oracle-parity conventions (the driver hash-compares against DuckDB):
  *  - money math is done in DECIMAL(18,2) (exact in both engines) and cast
  *    to DOUBLE only in the final projection;
  *  - timestamps are emitted as epoch milliseconds (BIGINT) or formatted
  *    strings, never raw timestamp columns (ns vs µs precision mismatch);
  *  - every result has a total ORDER BY so row order is deterministic.
  *
  * Scale posture: all grouping/joining keys here are the natural shuffle
  * keys; dimension tables (region/nation) get explicit broadcast hints, fact
  * joins are left to Catalyst/AQE so they stay sort-merge at 100 TB.
  */
object Relational extends QueryPack {

  /** Exact money arithmetic: cast to DECIMAL(18,2) before summing. */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Exact money arithmetic on the hot aggregation paths: integer cents.
    * The 2-dp money columns scale to exact BIGINTs (round() never sees a
    * .5 tie: a 2-dp value ×100 lands near an integer, never near a half),
    * so sums stay in codegen'd long arithmetic — Spark's DECIMAL sum
    * widens to precision 38, which leaves the unscaled-long fast path and
    * allocates a BigDecimal per row (~2.4× slower measured). Headroom:
    * cents·(100−disc) ~1e9/row ⇒ safe to ~9e9 rows per group sum.
    * DuckDB mirror: CAST(round(x*100) AS BIGINT).
    */
  private def cents(c: Column): Column = round(c * 100).cast("bigint")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A-series aggregation + F-series filter/scalar-map (SURVEY §2.3, §2.6):
    // TPC-H Q1 shape — scan with pushed filter, hash aggregate.
    "q01_pricing_summary" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.lineitem
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (sum(cents(col("l_quantity"))).cast("double") / 100).as("sum_qty"),
          (sum(cents(col("l_extendedprice"))).cast("double") / 100)
            .as("sum_base_price"),
          (sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
            .cast("double") / 10000).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // J-series multi-join + top-k (SURVEY §2.5, §2.8): TPC-H Q3 shape.
    "q02_top_revenue_orders" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.customer.filter(col("c_mktsegment") === "BUILDING")
        .join(t.orders.filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(t.lineitem.filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg((sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
          .cast("double") / 10000).as("revenue"))
        .select(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // 5-way join with broadcast dims (SURVEY §2.5 J3/J4 analog): Q5 shape.
    // The fact table (lineitem) is the stream/probe side of the final join
    // — written fact-last, Catalyst's estimate can pick the pruned fact as
    // the broadcast BUILD side (hashing 600k fact rows to probe 150k dim
    // rows), which inverts at scale. The dim chain (region→nation→customer
    // →orders) stays broadcast; the last join is left to AQE so it becomes
    // sort-merge when enriched-orders outgrows the broadcast threshold.
    "q03_region_nation_revenue" -> { (s, dir) =>
      val t = Tables(s, dir)
      val dims = broadcast(t.region)
        .join(broadcast(t.nation), col("r_regionkey") === col("n_regionkey"))
      val cust = t.customer.join(broadcast(dims),
        col("n_nationkey") === col("c_nationkey"))
      // NO broadcast hint on cust: customer⋈dims is ENTITY-scale
      // (O(customers)), and a mandatory hint is honored regardless of
      // size — at 100× it OOMs the executors. Dims stay hinted (bounded
      // lookup tables); the orders⋈customer join is left to AQE, which
      // broadcasts it while it fits and falls back to SMJ on o_custkey
      // when it doesn't — the scale-safe default.
      val ord = t.orders.join(cust,
        col("c_custkey") === col("o_custkey"))
        .select(col("o_orderkey"), col("r_name"), col("n_name"))
      // Pre-aggregate the fact by its join key BEFORE the fact-dim SMJ:
      // lineitem rows for one order are adjacent in the file, so map-side
      // combine collapses the ~4 items/order locally and the shuffle
      // carries one row per order instead of one per item (4x volume cut
      // — the lever that matters at cluster scale). The agg's hash
      // partitioning on l_orderkey is exactly the join's requirement, so
      // the join adds no second exchange on the fact side. Revenue is
      // exact integer cents, so sum-of-partials == flat sum bit-for-bit.
      val factByOrder = t.lineitem
        .groupBy(col("l_orderkey"))
        .agg(sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
            .as("rev_c"),
          count(lit(1)).as("items"))
      factByOrder.join(ord, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg((sum(col("rev_c")).cast("double") / 10000).as("revenue"),
          sum(col("items")).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // Semi join / EXISTS (SURVEY §2.5): orders with any heavy lineitem.
    "q04_priority_with_heavy_items" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.orders
        .join(t.lineitem.filter(col("l_quantity") > 45).select("l_orderkey"),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    },

    // Anti join / NOT EXISTS (SURVEY §2.5 J9 semantics): customers with no
    // recent order (windowed so the result is non-empty at every SF).
    "q05_customers_without_orders" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.customer
        .join(t.orders
            .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
            .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          (sum(cents(col("c_acctbal"))).cast("double") / 100).as("sum_acctbal"))
        .orderBy(col("c_mktsegment"))
    },

    // W1/W4 running prefix sum (SURVEY §2.7) over a partitioned window.
    "q06_running_customer_spend" -> { (s, dir) =>
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.orders.select(
          col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          (sum(cents(col("o_totalprice"))).over(w).cast("double") / 100)
            .as("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // W3/W9 lag/lead segment deltas (SURVEY §2.7) on the events table.
    "q07_event_gaps" -> { (s, dir) =>
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t.events
        .withColumn("ts_ms", unix_millis(col("ts")))
        .withColumn("gap_ms", col("ts_ms") - lag(col("ts_ms"), 1).over(w))
        .filter(col("gap_ms").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("gap_ms")).as("sum_gap_ms"),
          max(col("gap_ms")).as("max_gap_ms"))
        .orderBy(col("event_type"))
    },

    // A2 first-wins dedup via row_number (SURVEY §2.6).
    "q08_first_event_per_user" -> { (s, dir) =>
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t.events
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_millis(col("ts")).as("ts_ms"))
        .orderBy(col("user_id"))
    },

    // A6 argmax per group (SURVEY §2.6) — top customer per nation.
    "q09_top_customer_per_nation" -> { (s, dir) =>
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t.customer
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("c_name"), col("c_acctbal"))
        .orderBy(col("n_name"))
    },

    // W10/W11 generator expansion (SURVEY §2.7): sequence + explode.
    "q10_order_installments" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.orders
        .withColumn("n", (col("o_orderkey") % 3 + 1).cast("int"))
        .withColumn("cents", (dec(col("o_totalprice")) * 100).cast("bigint"))
        .select(col("o_orderkey"),
          explode(sequence(lit(1), col("n"))).as("installment"),
          expr("CAST(cents DIV n AS BIGINT)").as("amount_cents"))
        .orderBy(col("o_orderkey"), col("installment"))
    },

    // U1 unpivot (SURVEY §2.9): wide measures → long rows, then aggregate.
    "q11_unpivot_measures" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.lineitem
        .select(col("l_orderkey"), expr(
          "stack(4, 'quantity', l_quantity, 'extendedprice', l_extendedprice," +
            " 'discount', l_discount, 'tax', l_tax) as (measure, value)"))
        .groupBy(col("measure"))
        .agg(count(lit(1)).as("n"),
          (sum(cents(col("value"))).cast("double") / 100).as("total"))
        .orderBy(col("measure"))
    },

    // ROLLUP hierarchy totals (subtotal + grand-total rows); sentinel
    // coalesce makes the null subtotal markers sortable/comparable.
    "q14_rollup_revenue" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.lineitem
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          (sum(cents(col("l_extendedprice"))).cast("double") / 100)
            .as("sum_price"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("sum_price"))
        .orderBy(col("returnflag"), col("linestatus"))
    },

    // CUBE (all 4 grouping sets, vs q14's rollup chain), disambiguated
    // by grouping_id — the bitmask (leftmost dim = high bit in both
    // engines) that tells a real NULL dimension value from a rolled-up
    // one. Spark expands grouping sets BEFORE the exchange (Expand →
    // partial agg → one shuffle keyed on the expanded grouping cols),
    // so the cube costs one pass and one exchange, not 4 scans.
    // RANGE-frame window (value-based frame, distinct from q06's
    // ROWS-unbounded running sum): per customer, trailing-7-day order
    // count and spend in cents at every order. The frame is defined on
    // the DAY VALUE (range [-6, 0]) — same-day peer orders aggregate
    // together regardless of row order, so the result is deterministic
    // without a unique-order tiebreak, and a gap of >7 days contributes
    // nothing (a ROWS frame could not express either). One shuffle on
    // custkey; frames evaluate in a single sorted pass per partition.
    "q19_trailing_week_spend" -> { (s, dir) =>
      val o = Tables(s, dir).orders
        .withColumn("day",
          datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
            .cast("int"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
        .rangeBetween(-6, 0)
      o.select(col("o_orderkey"), col("o_custkey"), col("day"),
          count(lit(1)).over(w).as("t7_n"),
          sum(cents(col("o_totalprice"))).over(w).as("t7_cents"))
        .orderBy(col("o_orderkey"))
    },

    // Pivot (the §2.9 inverse of q11's unpivot): per-returnflag revenue
    // cents spread across explicit ship-year columns. The value list is
    // FIXED (1995–2001) so the schema is deterministic — Spark's
    // implicit-pivot would otherwise run a distinct scan AND produce a
    // data-dependent schema, which no 100 TB pipeline wants. Catalyst
    // rewrites the explicit pivot into the same single hash aggregate of
    // conditional sums the oracle states; absent years surface as a
    // NULL column in both engines.
    "q18_pivot_year_revenue" -> { (s, dir) =>
      Tables(s, dir).lineitem
        .withColumn("yr", year(col("l_shipdate")))
        .groupBy(col("l_returnflag"))
        .pivot("yr", (1995 to 2001).map(Integer.valueOf))
        .agg(sum(cents(col("l_extendedprice"))))
        .select(col("l_returnflag") +:
          (1995 to 2001).map(y => col(s"`$y`").as(s"y$y")): _*)
        .orderBy(col("l_returnflag"))
    },

    "q17_cube_revenue" -> { (s, dir) =>
      Tables(s, dir).lineitem
        .withColumn("ship_year", year(col("l_shipdate")))
        .cube(col("l_returnflag"), col("ship_year"))
        // grouping_id() must ride the aggregate list — it reads the
        // Expand node's synthetic spark_grouping_id attribute, which a
        // post-agg Project can no longer see
        .agg(grouping_id().cast("int").as("gid"),
          count(lit(1)).as("n"),
          (sum(cents(col("l_extendedprice"))).cast("double") / 100)
            .as("sum_price"))
        .select(col("gid"),
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("ship_year"), lit(-1)).cast("int").as("ship_year"),
          col("n"), col("sum_price"))
        .orderBy(col("gid"), col("returnflag"), col("ship_year"))
    },

    // GROUPING SETS — the general form q14's ROLLUP and q17's CUBE are
    // sugar over, with a deliberately non-prefix-chain set list
    // (((flag,status),(status),()) is not expressible as ROLLUP): one
    // Expand node fans each row into the requested grouping combinations
    // and ONE hash aggregate consumes them — one scan, one shuffle, for
    // all three granularities (vs three scans + a union in the naive
    // formulation). grouping_id disambiguates a real NULL key from a
    // rolled-up one.
    "q20_grouping_sets_revenue" -> { (s, dir) =>
      Tables(s, dir).lineitem
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_linestatus")), Seq.empty[Column]),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("int").as("gid"),
          count(lit(1)).as("n"),
          (sum(cents(col("l_extendedprice"))).cast("double") / 100)
            .as("sum_price"))
        .select(col("gid"),
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("sum_price"))
        .orderBy(col("gid"), col("returnflag"), col("linestatus"))
    },

    // RECURSIVE-HIERARCHY rollup (operators/Hierarchy): BOM-explosion
    // semantics — every part reports its whole subtree's cost and
    // descendant count over the synthetic parent(k) = k div 7 forest
    // (roots k < 7). The single-node form is a recursive CTE walking
    // O(V·depth) closure rows; the engine runs a level-synchronous
    // fixpoint of depth rounds, each one V-sized join + aggregate. The
    // round budget derives from the max key on the driver (a bounded
    // scalar, the s10 cutoff doctrine); overshoot is a fixpoint no-op.
    "q21_hierarchy_rollup" -> { (s, dir) =>
      val p = Tables(s, dir).part
      val maxK = p.agg(max(col("p_partkey")).cast("long"))
        .collect()(0).getLong(0)
      var m = maxK; var depth = 0
      while (m >= 7) { m /= 7; depth += 1 }
      // close the forest under the EXISTING key set: a computed parent
      // key with no part row is a dangling pointer, and the two engines
      // would disagree on whether it aggregates (the sf1 key-shifted
      // copies surfaced exactly this) — a node whose parent doesn't
      // exist is a root, on both sides, by construction
      val keys = p.select(col("p_partkey").as("__pk"))
      val nodes = p.select(col("p_partkey").as("k"),
          when(col("p_partkey") >= 7, expr("p_partkey div 7"))
            .as("parent0"),
          cents(col("p_retailprice")).as("v"))
        .join(keys, col("parent0") === col("__pk"), "left")
        .select(col("k"),
          when(col("__pk").isNotNull, col("parent0")).as("parent"),
          col("v"))
      graft.operators.Hierarchy
        .subtreeAggregate(nodes, "k", "parent", "v", rounds = depth + 1)
        .select(col("k"), col("total").as("total_cents"), col("n_desc"))
        .orderBy(col("k"))
    },

    // Sketch-based approximations — the 100 TB substitutes for exact
    // distinct counts and exact quantiles (HLL++ / KLL-style, mergeable
    // map-side, bounded memory). No SQL oracle: sketch implementations
    // differ across engines, so the driver records a rows-only check;
    // the exact counterparts (q12) cover correctness.
    "q15_approx_stats" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.lineitem
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
            .as("p50_price"),
          percentile_approx(col("l_extendedprice"), lit(0.99), lit(1000))
            .as("p99_price"))
        .orderBy(col("l_returnflag"))
    },

    // Exact discrete percentiles — the oracled counterpart to q15's
    // sketches. Formulated as pre-aggregated counts + a cumulative
    // window with INTEGER threshold comparison (cum·100 ≥ p·tot — exact
    // rational arithmetic, engine-independent): equals
    // percentile_disc/quantile_disc (verified at all SFs) but avoids
    // Spark's per-percentile value-buffer aggregate, which was ~4 s at
    // sf0.1 vs ~1 s for this plan; at scale the buffers hold every
    // distinct value per group in executor memory, this shape spills.
    "q16_exact_percentiles" -> { (s, dir) =>
      // DISTRIBUTED two-phase prefix sum. A cumulative window partitioned
      // by l_returnflag alone funnels each flag's ~1/3 of the distinct
      // prices through ONE task — invisible at sf0.1 (~180k rows/task),
      // but the plan's only data-scale-proportional serial path at 100×.
      //
      // Phase 0 — counts per (flag, price) on a RANGE exchange: range
      // partitioning on (flag, price) satisfies the aggregate's
      // clustering requirement (same keys → same partition), so the
      // partial+final aggregates run co-located with no second exchange
      // (the hash-repartition form measured 1.4→1.25 s at sf0.1 for the
      // same reason: ~550k near-unique groups make map-side combine
      // worthless) — AND it leaves each flag's rows globally ordered by
      // price ACROSS partitions, which is what makes per-partition
      // prefix sums composable. `pid` is the range partition a row
      // landed in. localCheckpoint pins the sampled range boundaries:
      // the frame feeds both the offsets branch and the main pass, and
      // ReuseExchange can't dedupe self-join branches (attribute ids
      // differ — see Dedup.minhashLshPairs), so without materializing,
      // each branch would re-sample boundaries and could disagree on pid.
      val counts = Tables(s, dir).lineitem
        .select(col("l_returnflag"), col("l_extendedprice"))
        .repartitionByRange(col("l_returnflag"), col("l_extendedprice"))
        .groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("pid", spark_partition_id())
        .localCheckpoint()
      // Phase 1 — per-(pid, flag) subtotals: one row per partition×flag
      // (bounded by the shuffle-partition count, independent of data
      // volume), so the cross-partition offset windows over THIS frame
      // are free; the result broadcasts.
      val sub = counts.groupBy(col("pid"), col("l_returnflag"))
        .agg(sum(col("cnt")).as("part_cnt"))
      val wOff = Window.partitionBy(col("l_returnflag")).orderBy(col("pid"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wTot = Window.partitionBy(col("l_returnflag")).orderBy(col("pid"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val offsets = sub.select(col("pid"), col("l_returnflag"),
        coalesce(sum(col("part_cnt")).over(wOff), lit(0L)).as("off"),
        sum(col("part_cnt")).over(wTot).as("tot"))
      // Phase 2 — partition-LOCAL cumulative window: partitioned by
      // (pid, flag), so parallelism scales with the partition count, not
      // the flag cardinality; the broadcast offset lifts each local
      // prefix to the global one. Same exact integer-threshold pick
      // (cum·100 ≥ tot·p — exact rational arithmetic) as before; equals
      // percentile_disc, verified at all SFs.
      val wLoc = Window.partitionBy(col("pid"), col("l_returnflag"))
        .orderBy(col("l_extendedprice"))
      def pick(p: Int) = min(when(col("cum") * 100 >= col("tot") * p,
        col("l_extendedprice")))
      counts
        .withColumn("cum_loc", sum(col("cnt")).over(wLoc))
        .join(broadcast(offsets), Seq("pid", "l_returnflag"))
        .withColumn("cum", col("cum_loc") + col("off"))
        .groupBy(col("l_returnflag"))
        .agg(pick(50).as("p50_price"), pick(90).as("p90_price"),
          pick(99).as("p99_price"), max(col("tot")).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // Exact distinct aggregation (shuffle-heavy; exercises partial aggs).
    "q12_distinct_parts_per_flag" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.lineitem
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    },

    // F3/F4 conditional scalar maps (SURVEY §2.3) inside an aggregation.
    "q13_nation_account_health" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.customer
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          sum(when(col("c_acctbal") < 0, 1).otherwise(0)).as("n_negative"),
          max(col("c_acctbal")).as("max_bal"),
          min(col("c_acctbal")).as("min_bal"))
        .orderBy(col("n_name"))
    }
  )

  def oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100 AS sum_qty,
        | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100 AS sum_base_price,
        | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000 AS sum_disc_price,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_top_revenue_orders" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000 AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        | AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
        | AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q03_region_nation_revenue" ->
      """SELECT r_name, n_name,
        | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000 AS revenue,
        | COUNT(*) AS n_items
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        | JOIN customer ON n_nationkey = c_nationkey
        | JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q04_priority_with_heavy_items" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q05_customers_without_orders" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers,
        | CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS DOUBLE)/100 AS sum_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q06_running_customer_spend" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        | CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT))
        |   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/100
        |   AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q07_event_gaps" ->
      """WITH g AS (
        | SELECT event_type,
        |  epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
        | FROM events)
        |SELECT event_type, COUNT(*) AS n_gaps, CAST(SUM(gap_ms) AS BIGINT) AS sum_gap_ms,
        | MAX(gap_ms) AS max_gap_ms
        |FROM g WHERE gap_ms IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q08_first_event_per_user" ->
      """SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q09_top_customer_per_nation" ->
      """SELECT n_name, c_name, c_acctbal
        |FROM (SELECT *, row_number() OVER (PARTITION BY c_nationkey
        |        ORDER BY c_acctbal DESC, c_custkey) AS rn
        |      FROM customer) c
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE rn = 1 ORDER BY n_name""".stripMargin,

    "q10_order_installments" ->
      """WITH base AS (
        | SELECT o_orderkey, CAST(o_orderkey % 3 + 1 AS INT) AS n,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        | FROM orders)
        |SELECT o_orderkey, i.i AS installment,
        | CAST(cents // n AS BIGINT) AS amount_cents
        |FROM base JOIN (VALUES (1),(2),(3)) AS i(i) ON i.i <= n
        |ORDER BY o_orderkey, installment""".stripMargin,

    "q11_unpivot_measures" ->
      """WITH long AS (
        | SELECT 'quantity' AS measure, l_quantity AS value FROM lineitem
        | UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
        | UNION ALL SELECT 'discount', l_discount FROM lineitem
        | UNION ALL SELECT 'tax', l_tax FROM lineitem)
        |SELECT measure, COUNT(*) AS n,
        | CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100 AS total
        |FROM long GROUP BY measure ORDER BY measure""".stripMargin,

    "q14_rollup_revenue" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        | coalesce(l_linestatus, 'ALL') AS linestatus,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100
        |   AS sum_price
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    // GROUPING() bitmask semantics match Spark's grouping_id():
    // leftmost argument = most significant bit
    "q19_trailing_week_spend" ->
      """SELECT o_orderkey, o_custkey,
        | CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS INT) AS day,
        | COUNT(*) OVER w AS t7_n,
        | CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) OVER w
        |      AS BIGINT) AS t7_cents
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY CAST(o_orderdate AS DATE) - DATE '1970-01-01'
        |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,

    "q18_pivot_year_revenue" -> {
      val cols = (1995 to 2001).map(y =>
        s"CAST(SUM(CASE WHEN year(l_shipdate) = $y THEN " +
          s"CAST(round(l_extendedprice*100) AS BIGINT) END) AS BIGINT) AS y$y")
        .mkString(",\n ")
      s"""SELECT l_returnflag,
         | $cols
         |FROM lineitem GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin
    },

    "q17_cube_revenue" ->
      """SELECT CAST(GROUPING(l_returnflag, y) AS INT) AS gid,
        | coalesce(l_returnflag, 'ALL') AS returnflag,
        | CAST(coalesce(y, -1) AS INT) AS ship_year,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100
        |   AS sum_price
        |FROM (SELECT l_returnflag, year(l_shipdate) AS y, l_extendedprice
        |      FROM lineitem)
        |GROUP BY CUBE (l_returnflag, y)
        |ORDER BY gid, returnflag, ship_year""".stripMargin,

    "q21_hierarchy_rollup" ->
      """WITH RECURSIVE nodes AS (
        |  SELECT p_partkey AS k,
        |         CASE WHEN p_partkey >= 7
        |              AND (p_partkey // 7) IN (SELECT p_partkey FROM part)
        |              THEN p_partkey // 7 END AS p,
        |         CAST(round(p_retailprice*100) AS BIGINT) AS v
        |  FROM part),
        |anc AS (
        |  SELECT k AS anc, k AS node FROM nodes
        |  UNION ALL
        |  SELECT n.p, a.node FROM anc a JOIN nodes n ON a.anc = n.k
        |  WHERE n.p IS NOT NULL)
        |SELECT a.anc AS k,
        |       CAST(SUM(n.v) AS BIGINT) AS total_cents,
        |       CAST(COUNT(*) - 1 AS BIGINT) AS n_desc
        |FROM anc a JOIN nodes n ON n.k = a.node
        |GROUP BY a.anc ORDER BY k""".stripMargin,

    "q20_grouping_sets_revenue" ->
      """SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
        | coalesce(l_returnflag, 'ALL') AS returnflag,
        | coalesce(l_linestatus, 'ALL') AS linestatus,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100
        |   AS sum_price
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_linestatus), ())
        |ORDER BY gid, returnflag, linestatus""".stripMargin,

    "q16_exact_percentiles" ->
      """SELECT l_returnflag,
        | quantile_disc(l_extendedprice, 0.5) AS p50_price,
        | quantile_disc(l_extendedprice, 0.9) AS p90_price,
        | quantile_disc(l_extendedprice, 0.99) AS p99_price,
        | COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q12_distinct_parts_per_flag" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        | COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q13_nation_account_health" ->
      """SELECT n_name, COUNT(*) AS n_customers,
        | CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative,
        | MAX(c_acctbal) AS max_bal, MIN(c_acctbal) AS min_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin
  )
}
