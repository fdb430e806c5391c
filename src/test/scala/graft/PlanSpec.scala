package graft

import graft.queries.{Relational, GeoQ}

/** Physical-plan property guards: the scale behaviors the queries rely on
  * (filter pushdown into the parquet scan, column pruning, broadcast of
  * dimension tables, no cartesian products) asserted as tests so a
  * refactor can't silently regress them. These are the properties that
  * decide whether a plan survives a 100× scale-up — at sf0.01 a
  * regression costs milliseconds and is invisible in wall-clock.
  */
class PlanSpec extends SparkTestBase {

  private def formattedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfSmoke)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q01: shipdate filter is pushed into the parquet scan") {
    val plan = formattedPlan("q01_pricing_summary")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$plan")
  }

  test("q01: scan schema is pruned to the referenced columns") {
    val plan = formattedPlan("q01_pricing_summary")
    // lineitem has 16 columns; the query touches 6
    val read = plan.linesIterator.find(_.startsWith("ReadSchema:")).getOrElse("")
    assert(read.contains("l_returnflag") && read.contains("l_shipdate"))
    assert(!read.contains("l_comment") && !read.contains("l_shipmode"),
      s"unpruned scan: $read")
  }

  test("q03: dimension tables join via broadcast, no cartesian product") {
    val plan = formattedPlan("q03_region_nation_revenue")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
  }

  test("q05: anti join stays an anti join (no materialized NOT IN)") {
    val plan = formattedPlan("q05_customers_without_orders")
    assert(plan.contains("LeftAnti"), s"anti join lost:\n$plan")
  }

  test("aggregations are partial (map-side combine) before the shuffle") {
    val plan = formattedPlan("q01_pricing_summary")
    // two HashAggregates around one Exchange = partial + final
    val aggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, s"no partial aggregation:\n$plan")
  }

  test("s13 IVM: the delta refresh never re-aggregates the base table — " +
      "increment frames broadcast, the stored view is read as a table") {
    val plan = formattedPlan("s13_ivm_delta")
    // the stored view joins deltas via broadcast (both delta sides are
    // increment-sized), so no exchange may carry the customer snapshot's
    // aggregation — the only HashAggregates allowed are the
    // increment-sized delta rollup (partial+final) and broadcast builds
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    // the base VIEW comes from the warehouse table, not a re-aggregation
    // of customer: the view-side scan must not be followed by an
    // aggregate over c_acctbal
    assert(plan.contains("graft_wh_ivm_base_seg"),
      s"base view not read from the warehouse:\n$plan")
  }

  test("e17 watermark audit: one data-sized exchange (the range " +
      "partitioning); offsets join is broadcast") {
    val plan = formattedPlan("e17_watermark_audit")
    assert(plan.contains("BroadcastHashJoin"), s"offsets not broadcast:\n$plan")
    // rangepartitioning appears exactly once as a data exchange; the
    // delay fan-out must not add another data-sized shuffle before the
    // final 3-row aggregate
    assert(plan.contains("rangepartitioning"), s"no range exchange:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("e18 CEP: one data-scale key exchange — the window's hash " +
      "partitioning is REUSED by the sequence aggregate; patterns ride " +
      "a bounded broadcast") {
    val plan = formattedPlan("e18_pattern_matches")
    // the row_number cap window and the collect_list aggregate share
    // hashpartitioning(user_id): exactly ONE data-scale exchange; the
    // two post-join exchanges carry pattern-cardinality rows (bounded)
    val dataExchanges = plan.linesIterator
      .count(l => l.trim.startsWith("(") && l.contains(") Exchange"))
    assert(dataExchanges <= 3, s"$dataExchanges exchanges:\n$plan")
    assert(plan.contains("Window"), plan)
    // the pattern fan-out is a broadcast of a literal handful of rows,
    // never a data-scale product
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), s"data-scale join crept in:\n$plan")
  }

  test("d21 containment: candidate and verify joins are equi-joins " +
      "(shuffled-hash for the array sides), no cartesian anywhere") {
    val plan = formattedPlan("d21_containment_pairs")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // the two array-shipping verify joins keep the shuffle_hash hint
    // (broadcasting the corpus's shingle arrays was measured +2.4 s at
    // sf0.1 and impossible at scale — the d09 doctrine)
    assert(plan.linesIterator.count(_.contains("ShuffledHashJoin")) >= 2,
      s"verify joins lost the shuffle-hash shape:\n$plan")
  }

  test("p02 manifest pipeline fuses to two shuffles (dedup window + sort)") {
    // the composed pipeline (fingerprint dedup + quality gate + split)
    // must stay one plan: all per-row scoring fused into projections,
    // shuffles only where semantics force them
    val plan = formattedPlan("p02_training_manifest")
    val exchanges = plan.linesIterator.count(_.trim.startsWith("+- Exchange"))
    assert(exchanges <= 2, s"$exchanges shuffles:\n$plan")
    assert(plan.contains("Scan parquet"), plan)
  }

  test("q16: every window is partition-local (no constant-cardinality key)") {
    // the exact-percentile prefix sum must stay distributed: a window
    // partitioned by l_returnflag ALONE (3 values) would funnel a third
    // of the distinct prices through one task — the regression this
    // guards. Every window spec in the plan must involve the range
    // partition id (the big frame's cumulative windows partition BY it;
    // the tiny offsets frame's windows order by it).
    val plan = formattedPlan("q16_exact_percentiles")
    val specs = plan.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(specs.nonEmpty, s"no windows found:\n$plan")
    specs.foreach(l => assert(l.contains("pid#"),
      s"window not keyed/ordered by the partition id: $l"))
    // the offsets frame joins back via broadcast — the big frame must
    // never shuffle for it
    assert(plan.contains("BroadcastHashJoin"), s"offsets join not broadcast:\n$plan")
  }

  test("d10: neither table shuffles — bloom probe + broadcast joins only") {
    // the whole point of the operator: the corpus feeds a driver sketch
    // and a broadcast-probed semi join, the increment is filtered and
    // anti-joined against a broadcast. Allowed shuffles: the final
    // presentation orderBy + the two distincts that BOUND the broadcast
    // sides — those move O(candidates), never O(corpus). What must never
    // appear is a shuffled join of either big table.
    val plan = formattedPlan("d10_bloom_increment_dedup")
    val shuffles = plan.linesIterator
      .count(_.trim.startsWith("+- Exchange"))
    assert(shuffles <= 3, s"$shuffles shuffles:\n$plan")
    assert(plan.contains("bloom_might_contain"), s"bloom probe missing:\n$plan")
    val broadcastJoins =
      "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcastJoins >= 2, s"joins not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"big-table shuffle join:\n$plan")
  }

  test("t10: chunking is shuffle-free up to the final sort") {
    val plan = formattedPlan("t10_chunk_windows")
    val shuffles = plan.linesIterator
      .count(_.trim.startsWith("+- Exchange"))
    assert(shuffles <= 1, s"$shuffles shuffles:\n$plan")
    // per-row explode, not a window function
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
  }

  test("d13: no vector column rides the cell-keyed exchange") {
    // semanticDedup's candidate generation must ship ONLY (id, cell)
    // through the cell shuffle — the cell key is the skewed one and the
    // pair join's output is the quadratic term; vectors re-join by id.
    // Broadcast thresholds would hide the exchange at test scale, so
    // force the SMJ shape (what a 100 TB corpus gets).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = formattedPlan("d13_semantic_dedup")
      // formatted node details: "(n) Exchange\nInput [k]: [...]\n
      // Arguments: hashpartitioning(...)..."
      val sections = plan.split("\\n\\(\\d+\\) ").toSeq
      val cellExchanges = sections.filter(s =>
        s.startsWith("Exchange") && s.contains("hashpartitioning") &&
          s.linesIterator.exists(l =>
            l.startsWith("Arguments:") && l.contains("cell")))
      assert(cellExchanges.nonEmpty, s"no cell-keyed exchange found:\n$plan")
      cellExchanges.foreach(s =>
        assert(!s.contains("__v") && !s.contains("embedding"),
          s"vector column rides the cell exchange:\n$s"))
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("p09: packing fold is one group-key exchange (no window, no join)") {
    // nextFitPack's scale contract: one hash exchange on the group key,
    // a spill-backed partition sort, then the O(1)-state fold — the
    // minSpacingSweep shape. A Window or a second Exchange here means
    // somebody re-expressed the fold as a whole-group materialization.
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("source"), col("doc_id"),
        graft.functions.text.tokenCount(col("text")).cast("long").as("n_tok"))
    val plan = graft.operators.Packing
      .nextFitPack(docs, "source", "doc_id", "n_tok", budget = 1024L)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val shuffles = plan.linesIterator.count(_.trim.startsWith("+- Exchange"))
    assert(shuffles == 1, s"$shuffles shuffles:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
  }

  test("t16: classifier inference is per-row — no join, only the sort exchange") {
    // hashedLinearScore's contract: model inference runs at scan speed
    // as a pure projection (hash + literal-array lookup + fold). Any
    // Join or aggregate Exchange here means the model stopped being a
    // broadcast literal.
    val plan = formattedPlan("t16_quality_classifier")
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
    val shuffles = plan.linesIterator
      .count(_.trim.startsWith("+- Exchange"))
    assert(shuffles <= 1, s"$shuffles shuffles (want only the sort):\n$plan")
    assert(plan.contains("rangepartitioning") || shuffles == 0,
      s"non-sort exchange:\n$plan")
  }

  test("t14: benchmark side broadcasts; corpus text never shuffles") {
    // fuzzy decontamination's contract at 100 TB: the corpus-side rows
    // reach the gram join via broadcast probe (no exchange carrying the
    // corpus), and only the post-join hit rows aggregate.
    val plan = formattedPlan("t14_fuzzy_decontaminate")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    val sections = plan.split("\\n\\(\\d+\\) ").toSeq
    val exchanges = sections.filter(s => s.startsWith("Exchange") &&
      s.contains("hashpartitioning"))
    // hash exchanges may exist only for the small post-join aggregate
    // and the tiny bench-side reductions — never carrying the corpus
    // text column
    exchanges.foreach(s => assert(!s.contains("text#"),
      s"corpus text rides an exchange:\n$s"))
  }

  test("e06: funnel fold is entity-keyed exchanges only, no window") {
    val plan = formattedPlan("e06_funnel_stages")
    assert(!plan.contains("Window"), s"unexpected window function:\n$plan")
    // every hash exchange keys on the entity (user_id) — the fold and
    // the final small rollup; nothing shuffles on a per-event key
    val sections = plan.split("\\n\\(\\d+\\) ").toSeq
    sections.filter(s => s.startsWith("Exchange") &&
        s.contains("hashpartitioning")).foreach { s =>
      assert(s.contains("user_id") || s.contains("reached"),
        s"exchange keyed off neither user_id nor reached:\n$s")
    }
  }

  test("v13: SQ8 scan is a shuffle-free fused pass (TakeOrdered, no join)") {
    val plan = formattedPlan("v13_sq8_topk")
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrdered:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
    val shuffles = plan.linesIterator.count(_.trim.startsWith("+- Exchange"))
    assert(shuffles == 0, s"$shuffles shuffles:\n$plan")
  }

  test("checkpoint partitioning: dropped under AQE, preserved without") {
    // Documents the loop operators' measured reality (Routing.bfsHops,
    // Dedup.dupClusters, Ranking.pageRank): the repartition-before-
    // checkpoint is a physical layout/BALANCE optimization, not exchange
    // elision — under AQE (the production config) Dataset checkpoints
    // drop outputPartitioning, so per-round joins re-plan their own
    // exchanges. Pin BOTH directions so a Spark upgrade changing either
    // invalidates the operator comments loudly (if AQE checkpoints ever
    // preserve the layout, the loops get genuine exchange elision for
    // free and the bucketed-table guidance should be revisited).
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.functions.col
    val base = (1 to 200).map(i => (s"n${i % 10}", s"n${(i * 3) % 10}"))
      .toDF("src", "dst")
    val aqePart = base.repartition(col("src")).localCheckpoint()
      .queryExecution.executedPlan.outputPartitioning
    assert(!aqePart.isInstanceOf[HashPartitioning],
      s"AQE checkpoint now PRESERVES $aqePart — revisit the loop layout " +
        "comments: exchange elision is available")
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val part = base.repartition(col("src")).localCheckpoint()
        .queryExecution.executedPlan.outputPartitioning
      assert(part.isInstanceOf[HashPartitioning] &&
        part.asInstanceOf[HashPartitioning].expressions
          .exists(_.toString.contains("src")),
        s"non-AQE checkpoint lost the layout: $part")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("e09/g06: binned joins plan as equi-joins — no nested-loop, no cartesian") {
    for (name <- Seq("e09_interval_attribution", "g06_grid_radius_join")) {
      val plan = formattedPlan(name)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"$name fell back to an unpartitionable join:\n$plan")
      // the residual predicate must NOT be the join itself
      assert(plan.contains("SortMergeJoin") || plan.contains("HashJoin"),
        s"$name has no equi-join:\n$plan")
    }
  }

  test("p14: frontier steps broadcast back; no inequality self-join") {
    val plan = formattedPlan("p14_pareto_frontier")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"skyline decomposition regressed to a dominance join:\n$plan")
  }

  test("p15: shard manifest has no global sort before the window") {
    // the per-shard row_number must partition by shard — a missing
    // partition key would plan a single-partition window (the q16 guard)
    val plan = formattedPlan("p15_shard_manifest")
    val winLines = plan.linesIterator.filter(_.contains("Window")).mkString
    assert(!winLines.contains("Window ["), s"unexpected plan:\n$plan")
    assert(plan.contains("hashpartitioning(shard"),
      s"window not shard-partitioned:\n$plan")
  }

  test("d16: chunk assembly is doc-keyed — one data-scale exchange kind") {
    val plan = formattedPlan("d16_cdc_chunk_sharing")
    // every data-scale exchange hashes on doc_id or chunk_hash (the
    // ids-only sharing join); no exchange on raw text columns
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"bad join:\n$plan")
    val exLines = plan.linesIterator
      .filter(_.contains("hashpartitioning")).mkString("\n")
    assert(!exLines.contains("term"), s"raw tokens rode an exchange:\n$exLines")
  }

  test("v17: both recall legs fuse into ONE window pass (no second scan)") {
    val plan = formattedPlan("v17_ann_recall")
    // Spark splits row_number and the framed conditional sum into two
    // adjacent Window nodes, but they share ONE Sort+Exchange — the pin
    // is the exchange count: qid window shuffle + final orderBy = 2.
    // A regressed filter-then-rank formulation plans a second window
    // shuffle (and a third corpus scan) on the probe leg.
    val exchanges = plan.linesIterator
      .count(_.matches(".*\\(\\d+\\) Exchange\\s*"))
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$plan")
    val scans = plan.linesIterator
      .count(l => l.contains("Scan parquet") && l.contains("embeddings"))
    assert(scans <= 2, s"recall legs re-scan the corpus ($scans scans):\n$plan")
  }

  test("v20: panel broadcasts; the corpus side sees no exchange before " +
    "the cell join") {
    val plan = formattedPlan("v20_ivf_batch_probe")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    // the ONLY hash exchange allowed is the per-query top-k window's
    // qid partitioning (post-join); a second one would mean the corpus
    // shuffled on its way INTO the cell join
    val hashEx = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashEx <= 1, s"corpus shuffled before the cell join:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("d18: band joins are equi-joins, no corpus-squared nested loop") {
    val plan = formattedPlan("d18_crosscorpus_neardup")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"non-equi candidate generation:\n$plan")
  }

  test("e16: the fill window partitions by series — no global window") {
    val plan = formattedPlan("e16_gap_fill_ffill")
    assert(plan.contains("Window"), s"no window:\n$plan")
    // an unpartitioned window would plan Exchange SinglePartition
    // directly feeding the Window
    assert(!plan.contains("Exchange SinglePartition"),
      s"fill window funnels to one partition:\n$plan")
  }

  test("t20: sensitivity sweep is one aggregate pass — no join, one scan") {
    val plan = formattedPlan("t20_dedup_sensitivity")
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
    val scans = plan.linesIterator
      .count(l => l.contains("Location") && l.contains("documents.parquet"))
    assert(scans == 1, s"sweep re-scans the corpus ($scans):\n$plan")
  }

  test("whole-stage codegen covers the q01 scan-filter-aggregate path") {
    // codegen explain can't see through a pre-execution AdaptiveSparkPlan
    // wrapper, so inspect the plan with AQE off (codegen behavior is the
    // same; AQE only re-plans exchanges)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = SparkEntry.queries("q01_pricing_summary")(spark, sfSmoke)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      val m = "Found (\\d+) WholeStageCodegen subtrees".r.findFirstMatchIn(plan)
      assert(m.exists(_.group(1).toInt >= 1), s"no codegen subtree:\n${plan.take(400)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("kernelParallel: widens a one-partition scan, EXACT no-op on " +
    "multi-file data") {
    // the g10 row-group guard, shared: on cluster-shaped data (file
    // splits >= half the session cores) the helper must return the very
    // same frame — zero added shuffle — and only a pathologically
    // narrow scan gets the repartition
    val dir = java.nio.file.Files
      .createTempDirectory("graft-kp").toString
    spark.range(0, 1000).toDF("id").repartition(8)
      .write.mode("overwrite").parquet(dir)
    val multi = spark.read.parquet(dir)
    assert(multi.rdd.getNumPartitions * 2 >=
      spark.sparkContext.defaultParallelism, "fixture not multi-file")
    assert(Graft.kernelParallel(multi) eq multi, "no-op must be identity")
    val narrow = spark.range(0, 1000).toDF("id").coalesce(1)
    val widened = Graft.kernelParallel(narrow)
    assert(widened.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism,
      s"narrow scan not widened: ${widened.rdd.getNumPartitions}")
  }

  test("no broadcast hint pins a bare scan of an SF-scaling table") {
    // The scale-killer class: a MANDATORY broadcast hint is honored
    // regardless of size, so a hint whose subtree is a bare (un-bounded)
    // scan of a table that grows with the scale factor OOMs the executors
    // at 100× — exactly the q03 broadcast(customer⋈dims) regression. The
    // legitimate hint classes all bound cardinality between the scan and
    // the hint: an Aggregate (stats/medians/offsets), a Limit, or a
    // Filter (key-slice panels: vec_id = 0, isin(qids), contamination
    // id sets). region/nation are 5/25-row constants at every SF and
    // are exempt. A fixed-fraction Filter still technically scales —
    // this pin catches the bare-scan class, which is the one that has
    // actually regressed; fraction panels are adjudicated per query.
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val scaling = Seq("lineitem", "orders", "customer", "part", "supplier",
      "events", "documents", "embeddings")
    def scansScaling(p: LogicalPlan): Boolean = p.collectLeaves().exists {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map(_.toString.toLowerCase).exists(pp =>
            scaling.exists(t => pp.contains(s"/$t.parquet")))
        case _ => false
      }
      case _ => false
    }
    def boundsCardinality(p: LogicalPlan): Boolean = p.exists {
      case _: Aggregate | _: GlobalLimit | _: LocalLimit | _: Filter => true
      case j: Join if j.joinType.sql.contains("ANTI") => true
      case _ => false
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val hints = fn(spark, sfSmoke).queryExecution.analyzed.collect {
          case h: ResolvedHint => h
        }
        hints.collect {
          case h if scansScaling(h.child) && !boundsCardinality(h.child) =>
            s"$name: ${h.child.nodeName} subtree"
        }
    }
    assert(offenders.isEmpty,
      s"unbounded frames under mandatory broadcast hints:\n" +
        offenders.mkString("\n"))
  }
}
