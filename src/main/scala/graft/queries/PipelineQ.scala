package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.text
import graft.operators.Splits
import SqlMacros._

/** End-to-end training-data pipeline composition: deterministic hash
  * splits (p01) and the full manifest — exact-dedup keepers, quality
  * gate, split assignment — as ONE query (p02). The point of p02 is that
  * the composed pipeline stays a single declarative plan (Catalyst fuses
  * the per-row scoring into the dedup window's shuffle) AND stays
  * oracle-able end to end: every stage is engine-independent (md5
  * fingerprints/buckets, integer basis points).
  */
object PipelineQ extends QueryPack {

  private val Cuts = Seq("train" -> 90, "val" -> 5, "test" -> 5)

  /** Per-language sampling rates for p04: downsample the majority
    * language hard, the mid-size ones lightly (corpus rebalancing).
    */
  private val SampleRates = Seq("en" -> 20, "de" -> 60)
  private val SampleDefault = 90
  private val SampleSalt = 4

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Deterministic 90/5/5 split: per-split doc counts + char volume.
    "p01_split_counts" -> { (s, dir) =>
      Tables(s, dir).documents
        .withColumn("split", Splits.assignSplit(col("doc_id"), Cuts))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("split"))
    },

    // Group-stratified split: hash the USER key, so every event of a
    // user lands in one split (no leakage of a user across train/val) —
    // checked by counting distinct users and events per split.
    "p03_group_split_counts" -> { (s, dir) =>
      Tables(s, dir).events
        .withColumn("split", Splits.assignSplit(col("user_id"), Cuts))
        .groupBy(col("split"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy(col("split"))
    },

    // Deterministic stratified sampling (corpus rebalancing): keep a row
    // iff its id's stable md5 bucket falls under its language's rate — a
    // pure per-row predicate, so the "sample" is reproducible across
    // engines/reruns/partitionings (Spark's sampleBy is none of those).
    // Checked as per-language kept/total counts.
    "p04_stratified_sample" -> { (s, dir) =>
      Tables(s, dir).documents
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(Splits.stratifiedKeep(col("doc_id"), col("lang"),
              SampleRates, SampleDefault, SampleSalt), 1L).otherwise(0L))
            .as("n_sampled"))
        .orderBy(col("lang"))
    },

    // Token-budget source mixing: cap each source at 30k tokens,
    // admitting docs in deterministic md5-bucket order (greedy — the doc
    // that crosses the budget is kept). Checked as per-source kept-doc /
    // kept-token counts. Token accounting runs on REAL learned-BPE
    // counts (BpeTrain.encode with the in-session k=8 merge table, the
    // t21 encoder), not the regex approximation — budget math sees the
    // tokens a trained tokenizer would actually emit.
    "p05_source_token_budget" -> { (s, dir) =>
      import graft.operators.BpeTrain
      val docs = Tables(s, dir).documents
      // cached: shares t21's persisted fingerprint-guarded merge table —
      // the round-10 p05 regression was exactly this re-train per query
      val merges = BpeTrain.collectMerges(
        BpeTrain.learnMergesCached(docs, "text", k = 8))
      // token counting is the same kernel-dominated encode pass as t21 —
      // widen the single-row-group local scan (Graft.kernelParallel)
      val withTok = Tables(s, dir).documentsKernelParallel
        .select(col("doc_id"), col("source"),
          BpeTrain.encodeTokenCount(col("text"), merges).as("n_tok"))
      Splits.capTokensPerGroup(withTok, "source", "doc_id", "n_tok",
          budget = 30000L, salt = 5)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs_kept"),
          sum(col("n_tok")).as("tokens_kept"))
        .orderBy(col("source"))
    },

    // Target-distribution mixture (Splits.mixToTarget): resample 4
    // sources to a 50/30/15/5 token mixture — the binding group (src0:
    // equal actuals, largest target) keeps rate 10000, the rest thin
    // proportionally (6000/3000/1000 bp on uniform data). Exact
    // integer rate derivation + per-row md5 draw; other sources drop.
    "p12_target_mixture" -> { (s, dir) =>
      val d = Tables(s, dir).documents
        .select(col("doc_id"), col("source"),
          text.tokenCount(col("text")).cast("long").as("n_tok"))
      Splits.mixToTarget(d, "source", "doc_id", "n_tok",
          Seq("src0" -> 5000, "src1" -> 3000, "src2" -> 1500,
            "src3" -> 500), salt = 12)
        .select(col("doc_id"), col("source"), col("rate_bp"))
        .orderBy(col("doc_id"))
    },

    // Weight-proportional deterministic sampling (importance sampling):
    // keep probability = min(20·n_chars, 10⁴) basis points — longer docs
    // proportionally likelier to survive — as a pure per-row md5
    // predicate (Splits.keepByWeightBp): no shuffle, reproducible on any
    // engine/partitioning, monotone in the weight.
    "p06_weighted_sample" -> { (s, dir) =>
      Tables(s, dir).documents
        .filter(Splits.keepByWeightBp(col("doc_id"),
          least(col("n_chars") * 20, lit(10000L)), salt = 6))
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
    },

    // The COMPOSED corpus-prep pipeline — every hygiene stage of a
    // training-data build in ONE declarative plan (plus the CC loop the
    // keeper selection rides): LSH near-dup clusters → keeper docs →
    // held-out eval slice excluded → 8-gram decontamination against that
    // slice → repetition gate (per-row kernel, NO join) → integer
    // quality gate → split assignment → per-source token budget. Every
    // stage is engine-independent (md5 hashes, integer thresholds), so
    // the whole composition hash-matches a single DuckDB CTE chain.
    // Scale posture inherits from the parts: banded candidate joins,
    // broadcast contamination probe, per-row kernels, one window per
    // source for the budget.
    "p07_corpus_prep" -> { (s, dir) =>
      val t = Tables(s, dir)
      val docs = t.documents
      // near-dup keepers over the whole corpus (dedup precedes holdout)
      val pairs = graft.operators.Dedup.minhashLshPairs(
          t.documentsKernelParallel, "doc_id", "text", k = 8, bands = 2,
          shingleN = 3)
        .select(col("a"), col("b"))
      val clusters = graft.operators.Dedup.dupClusters(pairs,
        pairsCanonical = true) // (member, cluster); LSH pairs are a < b
      val bench = docs.filter(col("doc_id") % 10 === 7)
      val contaminated = graft.operators.Contamination.contaminatedDocs(
          docs.filter(col("doc_id") % 10 =!= 7), bench, "doc_id", "text",
          n = 8)
        .select(col("doc_id"))
      val st = graft.plans.ShingleStats
        .shingleStats(text.normText(col("text")), 3)
      docs
        .join(clusters, docs("doc_id") === clusters("member"), "left")
        .filter(col("cluster").isNull || col("cluster") === col("doc_id"))
        .drop("member", "cluster")
        .filter(col("doc_id") % 10 =!= 7)
        // the contaminated set is rare-hit by construction → broadcast
        .join(broadcast(contaminated), Seq("doc_id"), "left_anti")
        .withColumn("__st", st)
        .filter(col("__st").isNull ||
          col("__st.n_distinct") * 10 >= col("__st.n_grams") * 8)
        .withColumn("n_tok", text.tokenCount(col("text")))
        .withColumn("stops", text.markerHits(col("text"), TextQ.StopWords))
        .withColumn("punct", size(regexp_extract_all(col("text"),
          lit("[^a-zA-Z0-9 ]"), lit(0))))
        .filter(col("n_tok") > 0)
        // same exact integer basis points as t03/p02
        .withColumn("ltok", col("n_tok").cast("long"))
        .withColumn("num",
          lit(40L) * least(col("ltok"), lit(100L)) * col("ltok") * col("n_chars") +
            lit(3000L) * (col("ltok") - col("stops")) * col("n_chars") +
            lit(3000L) * (col("n_chars") - col("punct")) * col("ltok"))
        .withColumn("den", col("ltok") * col("n_chars"))
        .withColumn("bp", expr("(2 * num + den) div (2 * den)"))
        .filter(col("bp") >= 4000)
        .withColumn("split", Splits.assignSplit(col("doc_id"), Cuts))
        .select(col("doc_id"), col("source"), col("split"), col("n_tok"))
        .transform(Splits.capTokensPerGroup(_, "source", "doc_id", "n_tok",
          budget = 30000L, salt = 5))
        .orderBy(col("doc_id"))
    },

    // Cluster-retention POLICY: d06/p07 keep each near-dup cluster's
    // smallest id; a production curation pass keeps its BEST member —
    // argmax of t03's exact-integer quality, smallest id on ties. Output:
    // per cluster, the chosen keeper, its score, and the cluster size.
    // Scale shape: the cluster frame is bounded by the dup population
    // (≪ corpus); quality is a per-row kernel fused into the scan; the
    // argmax is one window + one size aggregate on the SAME cluster key
    // (one shuffle), joined cluster-to-cluster.
    "p08_cluster_best_keeper" -> { (s, dir) =>
      val t = Tables(s, dir)
      val pairs = graft.operators.Dedup.minhashLshPairs(
          t.documentsKernelParallel, "doc_id", "text", k = 8, bands = 2,
          shingleN = 3)
        .select(col("a"), col("b"))
      val clusters = graft.operators.Dedup.dupClusters(pairs,
        pairsCanonical = true) // (member, cluster)
      val scored = t.documents
        .select(col("doc_id"), col("n_chars"),
          text.tokenCount(col("text")).as("n_tok"),
          text.markerHits(col("text"), TextQ.StopWords).as("stops"),
          size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9 ]"), lit(0)))
            .as("punct"))
        .filter(col("n_tok") > 0) // zero-token members can't win keeper
        .withColumn("ltok", col("n_tok").cast("long"))
        .withColumn("num",
          lit(40L) * least(col("ltok"), lit(100L)) * col("ltok") * col("n_chars") +
            lit(3000L) * (col("ltok") - col("stops")) * col("n_chars") +
            lit(3000L) * (col("n_chars") - col("punct")) * col("ltok"))
        .withColumn("den", col("ltok") * col("n_chars"))
        .withColumn("bp", expr("(2 * num + den) div (2 * den)"))
        .select(col("doc_id"), col("bp"))
      val sizes = clusters.groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_members"))
      val w = Window.partitionBy(col("cluster"))
        .orderBy(col("bp").desc, col("member"))
      clusters.join(scored, col("member") === col("doc_id"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("cluster"), col("member").as("keeper"),
          col("bp").as("keeper_bp"))
        .join(sizes, Seq("cluster"))
        .orderBy(col("cluster"))
    },

    // Sequence packing: next-fit binning of each source's docs (doc_id
    // order) into 1024-token training sequences — the batching step
    // between corpus prep and the data loader. Rolled up per sequence
    // so the result is small and hash-stable; the oracle replays the
    // same fold as a recursive CTE (the e03 sweep pattern).
    "p09_sequence_packing" -> { (s, dir) =>
      val withTok = Tables(s, dir).documents
        .select(col("source"), col("doc_id"),
          text.tokenCount(col("text")).cast("long").as("n_tok"))
      graft.operators.Packing
        .nextFitPack(withTok, "source", "doc_id", "n_tok", budget = 1024L)
        .groupBy(col("source"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("seq_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("source"), col("seq_id"))
    },

    // Corpus snapshot diff: two simulated releases of the documents
    // table (old = ids %5≠4; new = ids %5≠0 with ids %7=3 edited) → per
    // -doc added/removed/changed/unchanged. Content never travels: each
    // side reduces to (id, md5 fingerprint) before the one full-outer
    // join.
    "p11_snapshot_diff" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val oldSnap = docs.filter(col("doc_id") % 5 =!= 4)
      val newSnap = docs.filter(col("doc_id") % 5 =!= 0)
        .withColumn("text", when(col("doc_id") % 7 === 3,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
      graft.operators.SnapshotDiff.diff(oldSnap, newSnap, "doc_id",
          Seq("text", "lang", "source"))
        .orderBy(col("doc_id"))
    },

    // LEAKAGE-SAFE split: hash the near-dup CLUSTER representative, not
    // the doc id, so a document and its near-duplicates always land in
    // the SAME split — the naive p01 assignment lets a train doc's
    // near-twin leak into test (the classic eval-inflation bug;
    // p03 is the same cure for the user-key case). Clusters are d06's
    // LSH+CC frame; singletons are their own representative. Rolled up
    // per split (docs, distinct groups, chars) for a small stable
    // result; the zero-crossing invariant itself is pinned in
    // OperatorsSpec against the pair list.
    "p10_leakage_safe_split" -> { (s, dir) =>
      val t = Tables(s, dir)
      val pairs = graft.operators.Dedup.minhashLshPairs(
          t.documentsKernelParallel, "doc_id", "text", k = 8, bands = 2,
          shingleN = 3)
        .select(col("a"), col("b"))
      val clusters = graft.operators.Dedup
        .dupClusters(pairs, pairsCanonical = true)
        .select(col("member").as("doc_id"), col("cluster"))
      t.documents
        .join(clusters, Seq("doc_id"), "left")
        .withColumn("rep", coalesce(col("cluster"), col("doc_id")))
        .withColumn("split", Splits.assignSplit(col("rep"), Cuts))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("rep")).as("n_groups"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("split"))
    },

    // Training-set manifest: keep each duplicate group's smallest id,
    // require mid+ quality, assign the split — one declarative plan.
    "p02_training_manifest" -> { (s, dir) =>
      val d = Tables(s, dir).documents
        .select(col("doc_id"), col("n_chars"),
          text.fingerprint(col("text")).as("fp"),
          text.tokenCount(col("text")).as("n_tok"),
          text.markerHits(col("text"), TextQ.StopWords).as("stops"),
          size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9 ]"), lit(0)))
            .as("punct"))
      d.withColumn("keeper", min(col("doc_id")).over(Window.partitionBy(col("fp"))))
        .filter(col("doc_id") === col("keeper") && col("n_tok") > 0)
        // same exact integer basis points as t03 (see TextQ for why
        // integers, not rounded doubles, and why n_tok widens to long)
        .withColumn("ltok", col("n_tok").cast("long"))
        .withColumn("num",
          lit(40L) * least(col("ltok"), lit(100L)) * col("ltok") * col("n_chars") +
            lit(3000L) * (col("ltok") - col("stops")) * col("n_chars") +
            lit(3000L) * (col("n_chars") - col("punct")) * col("ltok"))
        .withColumn("den", col("ltok") * col("n_chars"))
        .withColumn("bp", expr("(2 * num + den) div (2 * den)"))
        .filter(col("bp") >= 4000)
        .withColumn("split", Splits.assignSplit(col("doc_id"), Cuts))
        .select(col("doc_id"), col("split"), col("bp"))
        .orderBy(col("doc_id"))
    },

    // Curriculum phases: equal-size quality quartiles in global score
    // order (phase 1 = cleanest) WITHOUT the single-partition global
    // ntile sort — operators.Curriculum decomposes the global rank into
    // a score-histogram prefix (|domain| ≤ 10⁴ rows serialized) plus a
    // hash-distributed within-score rank; closed-form ntile arithmetic
    // maps rank → phase. The oracle is DuckDB's LITERAL ntile(4), so
    // the decomposition is proven equivalent, not just plausible.
    "p13_curriculum_phases" -> { (s, dir) =>
      val scored = Tables(s, dir).documents
        .select(col("doc_id"), col("n_chars"),
          text.tokenCount(col("text")).as("n_tok"),
          text.markerHits(col("text"), TextQ.StopWords).as("stops"),
          size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9 ]"), lit(0)))
            .as("punct"))
        .filter(col("n_tok") > 0)
        // same exact integer basis points as t03/p02/p07/p08
        .withColumn("ltok", col("n_tok").cast("long"))
        .withColumn("num",
          lit(40L) * least(col("ltok"), lit(100L)) * col("ltok") * col("n_chars") +
            lit(3000L) * (col("ltok") - col("stops")) * col("n_chars") +
            lit(3000L) * (col("n_chars") - col("punct")) * col("ltok"))
        .withColumn("den", col("ltok") * col("n_chars"))
        .withColumn("bp", expr("(2 * num + den) div (2 * den)"))
        .select(col("doc_id"), col("bp"), col("ltok"))
      graft.operators.Curriculum.phases(scored, "bp", "doc_id", k = 4)
        .groupBy(col("phase"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ltok")).as("sum_tokens"),
          min(col("bp")).as("min_bp"), max(col("bp")).as("max_bp"))
        .orderBy(col("phase"))
    },

    // Pareto-frontier corpus selection: the documents not strictly
    // beaten on BOTH "longer" (n_chars ↑) and "denser" (stopword hits ↓)
    // — the weight-free form of quality-vs-length curation (any scored
    // top-1 over these axes is drawn from this set). The engine runs
    // Skyline's histogram-prefix decomposition (one aggregate + a
    // domain-sized window + a broadcast join); the oracle runs the
    // textbook O(n²) NOT EXISTS dominance test — identical output
    // proves the decomposition.
    "p14_pareto_frontier" -> { (s, dir) =>
      val d = Tables(s, dir).documents
        .select(col("doc_id"), col("n_chars"),
          text.markerHits(col("text"), TextQ.StopWords)
            .cast("bigint").as("stops"))
      graft.operators.Skyline.paretoFrontier(d, "n_chars", "stops")
        .orderBy(col("doc_id"))
    },

    // Deterministic global-shuffle shard manifest (Splits.shardManifest
    // doc): md5 shard + independently-salted within-shard order — the
    // reproducible corpus shuffle a training run consumes. Emitted
    // row-level so the oracle pins every (shard, pos) assignment.
    "p15_shard_manifest" -> { (s, dir) =>
      Splits.shardManifest(
          Tables(s, dir).documents.select(col("doc_id")), "doc_id",
          numShards = 8)
        .orderBy(col("shard"), col("pos"))
    },

    // Exact-k weighted draw without replacement (A-Res; the
    // Splits.weightedSampleNoReplacement doc has the determinism
    // invariants and the TakeOrdered scale shape): 50 docs, inclusion
    // odds proportional to length — the eval-panel construction draw.
    "p16_weighted_panel" -> { (s, dir) =>
      Splits.weightedSampleNoReplacement(
          Tables(s, dir).documents.select(col("doc_id"), col("n_chars")),
          "doc_id", "n_chars", k = 50, salt = 7)
        .orderBy(col("samp_key").desc, col("doc_id"))
    },

    // α=1/2 temperature rebalance across sources (the mT5 multilingual
    // mixture; Splits.temperatureMixture doc has the exact-integer
    // derivation and the two-scan zero-shuffle shape).
    "p17_temperature_mixture" -> { (s, dir) =>
      Splits.temperatureMixture(
          Tables(s, dir).documents.select(col("doc_id"), col("source")),
          "source", "doc_id", budgetRows = 300L)
        .orderBy(col("source"))
    },

    // Removal AUDIT over p07's exact curation chain: instead of
    // filtering, every document is attributed to the FIRST stage that
    // removes it (dedup loser → holdout → contaminated → repetitive →
    // empty → low-quality → kept, the chain's own order) — the
    // "why was this doc dropped" lineage view every production
    // curation pass needs. Same components, same thresholds, same
    // exact-integer quality; output is the bounded per-stage rollup
    // with an id checksum, so the oracle proves the attribution of
    // EVERY doc, not just the survivor set.
    "p18_removal_audit" -> { (s, dir) =>
      val t = Tables(s, dir)
      val docs = t.documents
      val pairs = graft.operators.Dedup.minhashLshPairs(
          t.documentsKernelParallel, "doc_id", "text", k = 8, bands = 2,
          shingleN = 3)
        .select(col("a"), col("b"))
      val clusters = graft.operators.Dedup.dupClusters(pairs,
        pairsCanonical = true)
      val bench = docs.filter(col("doc_id") % 10 === 7)
      val contaminated = graft.operators.Contamination.contaminatedDocs(
          docs.filter(col("doc_id") % 10 =!= 7), bench, "doc_id", "text",
          n = 8)
        .select(col("doc_id")).withColumn("is_cont", lit(true))
      val st = graft.plans.ShingleStats
        .shingleStats(text.normText(col("text")), 3)
      docs
        .join(clusters, docs("doc_id") === clusters("member"), "left")
        .join(broadcast(contaminated), Seq("doc_id"), "left")
        .withColumn("__st", st)
        .withColumn("n_tok", text.tokenCount(col("text")))
        .withColumn("stops", text.markerHits(col("text"), TextQ.StopWords))
        .withColumn("punct", size(regexp_extract_all(col("text"),
          lit("[^a-zA-Z0-9 ]"), lit(0))))
        .withColumn("ltok", col("n_tok").cast("long"))
        // bp guarded by the CASE: its branch only evaluates when
        // ltok > 0, so the exact-integer division never sees a zero
        // denominator (p07 reaches the same safety by filtering first)
        .withColumn("stage",
          when(col("cluster").isNotNull && col("cluster") =!= col("doc_id"),
            "dedup_loser")
          .when(col("doc_id") % 10 === 7, "holdout")
          .when(col("is_cont").isNotNull, "contaminated")
          .when(col("__st").isNotNull &&
            col("__st.n_distinct") * 10 < col("__st.n_grams") * 8,
            "repetitive")
          .when(col("ltok") === 0, "empty")
          .when(expr("""(2 * (40 * least(ltok, 100) * ltok * n_chars
                + 3000 * (ltok - stops) * n_chars
                + 3000 * (n_chars - punct) * ltok)
                + ltok * n_chars) div (2 * ltok * n_chars)""") < 4000,
            "low_quality")
          .otherwise("kept"))
        .groupBy(col("stage"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id") % 9973).as("id_checksum"))
        .orderBy(col("stage"))
    },

    // p19 — k-ANONYMOUS release (the re-identification bound the PII
    // scrub t13 doesn't give): generalize the customer quasi-identifiers
    // (nation, segment, balance band) up a fixed 5-level ladder to the
    // FINEST level whose under-k residue fits a 1% suppression budget,
    // then collapse the residue into the all-'*' row. Level statistics
    // for the WHOLE ladder come from one explode+aggregate shuffle (the
    // manual GROUPING SETS expand — operators/Anonymize.scala has the
    // scale doctrine); the level decision is an L+1-number driver
    // collect. Fully deterministic, so the SQL mirror replays the level
    // choice and the release byte for byte.
    "p19_k_anonymous_release" -> { (s, dir) =>
      val c = Tables(s, dir).customer
      val bSign = when(col("c_acctbal") < 0, "neg").otherwise("nonneg")
      val ladder = Seq(
        Seq(col("c_nationkey").cast("string"), col("c_mktsegment"),
          floor(col("c_acctbal") / 100).cast("string")),
        Seq(col("c_nationkey").cast("string"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast("string")),
        Seq(col("c_nationkey").cast("string"), col("c_mktsegment"), bSign),
        Seq(col("c_nationkey").cast("string"), lit("*"), lit("*")),
        Seq(lit("*"), lit("*"), lit("*")))
      graft.operators.Anonymize.kAnonymousGroups(c, ladder,
          Seq("nation", "segment", "bal_band"), k = 8,
          maxSuppressedFrac = 0.01)
        .orderBy(col("nation"), col("segment"), col("bal_band"))
    }
  )

  private def splitCaseSql(idExpr: String): String =
    s"""CASE WHEN ${saltedHash32Sql(idExpr, 0)} % 100 < 90 THEN 'train'
       |     WHEN ${saltedHash32Sql(idExpr, 0)} % 100 < 95 THEN 'val'
       |     ELSE 'test' END""".stripMargin

  def oracle: Map[String, String] = Map(
    "p01_split_counts" ->
      s"""SELECT ${splitCaseSql("CAST(doc_id AS VARCHAR)")} AS split,
         | COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         |FROM documents GROUP BY 1 ORDER BY split""".stripMargin,

    "p03_group_split_counts" ->
      s"""SELECT ${splitCaseSql("CAST(user_id AS VARCHAR)")} AS split,
         | COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
         |FROM events GROUP BY 1 ORDER BY split""".stripMargin,

    "p04_stratified_sample" -> {
      val rateCase = SampleRates
        .map { case (l, p) => s"WHEN '$l' THEN $p" }
        .mkString("CASE lang ", " ", s" ELSE $SampleDefault END")
      s"""SELECT lang, COUNT(*) AS n_total,
         | CAST(SUM(CASE WHEN ${saltedHash32Sql("CAST(doc_id AS VARCHAR)", SampleSalt)} % 100
         |   < $rateCase THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
    },

    // n_tok = REAL learned-BPE token count: the shared t15/t21 training
    // stages learn b1..b8, the encode stages replay them over every word
    // occurrence, and the per-doc symbol counts feed the same greedy
    // budget window as before (empty-norm docs join back as 0 tokens).
    "p05_source_token_budget" -> {
      val k = 8
      s"""WITH ${bpeTrainStagesSql(k)},
         |dn AS (SELECT doc_id, $normSql AS norm FROM documents),
         |dw AS (SELECT doc_id, unnest(${wordsSql()}) AS word FROM dn),
         |e0 AS (SELECT doc_id,
         |         array_to_string(string_split(word, ''), ' ') AS sym
         |       FROM dw WHERE word <> ''),
         |${bpeEncodeStagesSql(k, "doc_id")},
         |tkc AS (SELECT doc_id,
         |          CAST(SUM(len(string_split(sym, ' '))) AS BIGINT) AS n_tok
         |        FROM e$k GROUP BY doc_id),
         |tk AS (SELECT d.doc_id, d.source, COALESCE(t.n_tok, 0) AS n_tok,
         |        ${saltedHash32Sql("CAST(d.doc_id AS VARCHAR)", 5)} % 100 AS b
         |       FROM documents d LEFT JOIN tkc t ON d.doc_id = t.doc_id),
         |c AS (SELECT *, SUM(n_tok) OVER (PARTITION BY source
         |        ORDER BY b, doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |      FROM tk)
         |SELECT source, COUNT(*) AS n_docs_kept,
         | CAST(SUM(n_tok) AS BIGINT) AS tokens_kept
         |FROM c WHERE cum - n_tok < 30000
         |GROUP BY source ORDER BY source""".stripMargin
    },

    "p06_weighted_sample" ->
      s"""SELECT doc_id, n_chars FROM documents
         |WHERE ${saltedHash32Sql("CAST(doc_id AS VARCHAR)", 6)} % 10000
         |  < least(n_chars * 20, 10000)
         |ORDER BY doc_id""".stripMargin,

    // same integer rate derivation: B = min(actual·10000 // share),
    // rate = ((B·share // 10000)·10000) // actual, then the md5 draw
    "p12_target_mixture" ->
      s"""WITH n AS (SELECT doc_id, source, $normSql AS norm
         |           FROM documents),
         |tok AS (SELECT doc_id, source,
         |          CAST(CASE WHEN norm = '' THEN 0
         |               ELSE len(${wordsSql()}) END AS BIGINT) AS nt
         |        FROM n),
         |t(g, share) AS (VALUES ('src0', 5000), ('src1', 3000),
         |                       ('src2', 1500), ('src3', 500)),
         |a AS (SELECT source, CAST(SUM(nt) AS BIGINT) AS actual
         |      FROM tok WHERE source IN ('src0','src1','src2','src3')
         |      GROUP BY source),
         |j AS (SELECT a.source, a.actual, t.share
         |      FROM a JOIN t ON t.g = a.source),
         |b AS (SELECT MIN(actual * 10000 // share) AS b FROM j),
         |r AS (SELECT source,
         |        CAST(((b.b * share) // 10000) * 10000 // actual
         |             AS BIGINT) AS rate_bp
         |      FROM j, b)
         |SELECT tok.doc_id, tok.source, r.rate_bp
         |FROM tok JOIN r ON tok.source = r.source
         |WHERE ${saltedHash32Sql("CAST(doc_id AS VARCHAR)", 12)} % 10000
         |  < r.rate_bp
         |ORDER BY tok.doc_id""".stripMargin,

    "p09_sequence_packing" ->
      s"""WITH RECURSIVE n AS (
         |  SELECT doc_id, source, $normSql AS norm FROM documents),
         |o AS (SELECT doc_id, source,
         |        CAST(CASE WHEN norm = '' THEN 0
         |             ELSE len(${wordsSql()}) END AS BIGINT) AS n_tok,
         |        row_number() OVER (PARTITION BY source
         |                           ORDER BY doc_id) AS rn
         |      FROM n),
         |walk(source, rn, doc_id, n_tok, filled, seq) AS (
         |  SELECT source, rn, doc_id, n_tok, n_tok, CAST(0 AS BIGINT)
         |  FROM o WHERE rn = 1
         |  UNION ALL
         |  SELECT o.source, o.rn, o.doc_id, o.n_tok,
         |    CASE WHEN w.filled > 0 AND w.filled + o.n_tok > 1024
         |         THEN o.n_tok ELSE w.filled + o.n_tok END,
         |    CASE WHEN w.filled > 0 AND w.filled + o.n_tok > 1024
         |         THEN w.seq + 1 ELSE w.seq END
         |  FROM walk w JOIN o ON o.source = w.source AND o.rn = w.rn + 1)
         |SELECT source, seq AS seq_id, COUNT(*) AS n_docs,
         | CAST(SUM(n_tok) AS BIGINT) AS seq_tokens,
         | MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM walk GROUP BY source, seq
         |ORDER BY source, seq_id""".stripMargin,

    "p11_snapshot_diff" ->
      s"""WITH o AS (SELECT doc_id, md5(concat_ws(chr(1),
         |    COALESCE(text, ''), COALESCE(lang, ''),
         |    COALESCE(source, ''))) AS fp
         |  FROM documents WHERE doc_id % 5 <> 4),
         |nw AS (SELECT doc_id, md5(concat_ws(chr(1),
         |    COALESCE(CASE WHEN doc_id % 7 = 3 THEN text || ' v2'
         |             ELSE text END, ''), COALESCE(lang, ''),
         |    COALESCE(source, ''))) AS fp
         |  FROM documents WHERE doc_id % 5 <> 0)
         |SELECT COALESCE(o.doc_id, nw.doc_id) AS doc_id,
         | CASE WHEN o.doc_id IS NULL THEN 'added'
         |      WHEN nw.doc_id IS NULL THEN 'removed'
         |      WHEN o.fp <> nw.fp THEN 'changed'
         |      ELSE 'unchanged' END AS status
         |FROM o FULL JOIN nw ON o.doc_id = nw.doc_id
         |ORDER BY doc_id""".stripMargin,

    // d06's cluster chain (LSH candidates → recursive-CTE CC) + the p01
    // split case over the cluster representative.
    "p10_leakage_safe_split" ->
      s"""${DedupQ.lshCtes.replaceFirst("^WITH ", "WITH RECURSIVE ")},
         |pe AS (SELECT a AS src, b AS dst FROM j
         |       UNION SELECT b, a FROM j),
         |reach(node, r) AS (
         |  SELECT src, src FROM pe
         |  UNION
         |  SELECT pe.dst, reach.r FROM reach JOIN pe ON pe.src = reach.node),
         |cl AS (SELECT node AS member, MIN(r) AS cluster
         |       FROM reach GROUP BY node),
         |rp AS (SELECT d.doc_id, COALESCE(cl.cluster, d.doc_id) AS rep,
         |         d.n_chars
         |       FROM documents d LEFT JOIN cl ON cl.member = d.doc_id)
         |SELECT ${splitCaseSql("CAST(rep AS VARCHAR)")} AS split,
         | COUNT(*) AS n_docs, COUNT(DISTINCT rep) AS n_groups,
         | CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         |FROM rp GROUP BY 1 ORDER BY split""".stripMargin,

    // The composed pipeline: d02/d06's LSH+CC chain (reused verbatim via
    // DedupQ.lshCtes) → t08's 8-gram decontamination chain → t09's
    // repetition stats → p02's integer quality gate → p01's split →
    // p05's token-budget window, all in one statement.
    "p07_corpus_prep" ->
      s"""${DedupQ.lshCtes.replaceFirst("^WITH ", "WITH RECURSIVE ")},
         |pe AS (SELECT a AS src, b AS dst FROM j UNION SELECT b, a FROM j),
         |reach(node, r) AS (
         |  SELECT src, src FROM pe
         |  UNION
         |  SELECT pe.dst, reach.r FROM reach JOIN pe ON pe.src = reach.node),
         |lab AS (SELECT node AS member, MIN(r) AS cluster
         |        FROM reach GROUP BY node),
         |sh8 AS (SELECT doc_id, ${shinglesNSql("w", 8)} AS s8 FROM w
         |        WHERE len(w) >= 8),
         |tok8 AS (SELECT DISTINCT doc_id, t
         |         FROM (SELECT doc_id, unnest(s8) AS t FROM sh8)
         |         WHERE t <> ''),
         |bg AS (SELECT DISTINCT t FROM tok8 WHERE doc_id % 10 = 7),
         |cont AS (SELECT DISTINCT c.doc_id FROM tok8 c JOIN bg USING (t)
         |         WHERE c.doc_id % 10 <> 7),
         |rep AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
         |         COUNT(*) AS n_distinct
         |        FROM (SELECT doc_id, s, COUNT(*) AS c
         |              FROM (SELECT doc_id, unnest(sh) AS s FROM sh)
         |              WHERE s <> '' GROUP BY doc_id, s)
         |        GROUP BY doc_id),
         |qn AS (SELECT d.doc_id, d.source, d.n_chars,
         |        len(regexp_extract_all(d.text, '[^a-zA-Z0-9 ]')) AS punct,
         |        CASE WHEN n.norm = '' THEN 0 ELSE len(w.w) END AS n_tok,
         |        ${markerHitsSql("w.w", TextQ.StopWords)} AS stops
         |       FROM documents d
         |       JOIN n ON n.doc_id = d.doc_id
         |       JOIN w ON w.doc_id = d.doc_id),
         |surv AS (SELECT q.doc_id, q.source, q.n_tok,
         |         (2 * (40 * least(q.n_tok, 100) * q.n_tok * q.n_chars
         |               + 3000 * (q.n_tok - q.stops) * q.n_chars
         |               + 3000 * (q.n_chars - q.punct) * q.n_tok)
         |          + q.n_tok * q.n_chars) // (2 * q.n_tok * q.n_chars) AS bp
         |        FROM qn q
         |        LEFT JOIN lab ON lab.member = q.doc_id
         |        LEFT JOIN rep ON rep.doc_id = q.doc_id
         |        WHERE (lab.member IS NULL OR lab.cluster = q.doc_id)
         |          AND q.doc_id % 10 <> 7
         |          AND q.doc_id NOT IN (SELECT doc_id FROM cont)
         |          AND (rep.doc_id IS NULL
         |               OR rep.n_distinct * 10 >= rep.n_grams * 8)
         |          AND q.n_tok > 0),
         |gb AS (SELECT doc_id, source, n_tok,
         |        ${saltedHash32Sql("CAST(doc_id AS VARCHAR)", 5)} % 100 AS bkt
         |       FROM surv WHERE bp >= 4000),
         |cw AS (SELECT *, SUM(n_tok) OVER (PARTITION BY source
         |        ORDER BY bkt, doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |       FROM gb)
         |SELECT doc_id, source,
         | ${splitCaseSql("CAST(doc_id AS VARCHAR)")} AS split,
         | CAST(n_tok AS INT) AS n_tok
         |FROM cw WHERE cum - n_tok < 30000 ORDER BY doc_id""".stripMargin,

    // d06's LSH+CC cluster chain + t03's integer quality → per-cluster
    // argmax keeper (bp DESC, member ASC) + cluster size.
    "p08_cluster_best_keeper" ->
      s"""${DedupQ.lshCtes.replaceFirst("^WITH ", "WITH RECURSIVE ")},
         |pe AS (SELECT a AS src, b AS dst FROM j UNION SELECT b, a FROM j),
         |reach(node, r) AS (
         |  SELECT src, src FROM pe
         |  UNION
         |  SELECT pe.dst, reach.r FROM reach JOIN pe ON pe.src = reach.node),
         |lab AS (SELECT node AS member, MIN(r) AS cluster
         |        FROM reach GROUP BY node),
         |sizes AS (SELECT cluster, COUNT(*) AS n_members
         |          FROM lab GROUP BY cluster),
         |qn AS (SELECT d.doc_id, d.n_chars,
         |        len(regexp_extract_all(d.text, '[^a-zA-Z0-9 ]')) AS punct,
         |        CASE WHEN n.norm = '' THEN 0 ELSE len(w.w) END AS n_tok,
         |        ${markerHitsSql("w.w", TextQ.StopWords)} AS stops
         |       FROM documents d
         |       JOIN n ON n.doc_id = d.doc_id
         |       JOIN w ON w.doc_id = d.doc_id),
         |b AS (SELECT doc_id,
         |       (2 * (40 * least(n_tok, 100) * n_tok * n_chars
         |             + 3000 * (n_tok - stops) * n_chars
         |             + 3000 * (n_chars - punct) * n_tok)
         |        + n_tok * n_chars) // (2 * n_tok * n_chars) AS bp
         |      FROM qn WHERE n_tok > 0),
         |r AS (SELECT lab.cluster, lab.member, b.bp,
         |       row_number() OVER (PARTITION BY lab.cluster
         |        ORDER BY b.bp DESC, lab.member) AS rn
         |      FROM lab JOIN b ON b.doc_id = lab.member)
         |SELECT r.cluster, r.member AS keeper, r.bp AS keeper_bp,
         | s.n_members
         |FROM r JOIN sizes s USING (cluster)
         |WHERE rn = 1 ORDER BY cluster""".stripMargin,

    "p02_training_manifest" ->
      s"""WITH n AS (
         | SELECT doc_id, n_chars, $normSql AS norm,
         |  len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS punct
         | FROM documents),
         |w AS (
         | SELECT doc_id, n_chars, punct, norm,
         |  CASE WHEN norm = '' THEN 0 ELSE len(${wordsSql()}) END AS n_tok,
         |  ${markerHitsSql(wordsSql(), TextQ.StopWords)} AS stops
         | FROM n),
         |k AS (SELECT *, min(doc_id) OVER (PARTITION BY md5(norm)) AS keeper
         |      FROM w),
         |q AS (SELECT doc_id, n_chars, punct, n_tok, stops FROM k
         |      WHERE doc_id = keeper AND n_tok > 0),
         |b AS (
         | SELECT doc_id,
         |  (2 * (40 * least(n_tok, 100) * n_tok * n_chars
         |        + 3000 * (n_tok - stops) * n_chars
         |        + 3000 * (n_chars - punct) * n_tok)
         |   + n_tok * n_chars) // (2 * n_tok * n_chars) AS bp
         | FROM q)
         |SELECT doc_id, ${splitCaseSql("CAST(doc_id AS VARCHAR)")} AS split, bp
         |FROM b WHERE bp >= 4000 ORDER BY doc_id""".stripMargin,

    // the literal global ntile the operator decomposes away — proving
    // the histogram-prefix + within-score-rank form exactly equivalent
    "p13_curriculum_phases" ->
      s"""WITH n AS (
         | SELECT doc_id, n_chars, $normSql AS norm,
         |  len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS punct
         | FROM documents),
         |w AS (
         | SELECT doc_id, n_chars, punct,
         |  CASE WHEN norm = '' THEN 0 ELSE len(${wordsSql()}) END AS n_tok,
         |  ${markerHitsSql(wordsSql(), TextQ.StopWords)} AS stops
         | FROM n),
         |q AS (
         | SELECT doc_id, CAST(n_tok AS BIGINT) AS ltok,
         |  (2 * (40 * least(n_tok, 100) * n_tok * n_chars
         |        + 3000 * (n_tok - stops) * n_chars
         |        + 3000 * (n_chars - punct) * n_tok)
         |   + n_tok * n_chars) // (2 * n_tok * n_chars) AS bp
         | FROM w WHERE n_tok > 0),
         |t AS (SELECT doc_id, ltok, bp,
         |        ntile(4) OVER (ORDER BY bp DESC, doc_id) AS phase
         |      FROM q)
         |SELECT CAST(phase AS INT) AS phase, COUNT(*) AS n_docs,
         | CAST(SUM(ltok) AS BIGINT) AS sum_tokens,
         | MIN(bp) AS min_bp, MAX(bp) AS max_bp
         |FROM t GROUP BY phase ORDER BY phase""".stripMargin,

    // the textbook O(n²) dominance test the engine's histogram-prefix
    // decomposition must equal
    "p14_pareto_frontier" ->
      s"""WITH n AS (
         | SELECT doc_id, n_chars, $normSql AS norm FROM documents),
         |d AS (
         | SELECT doc_id, n_chars,
         |  ${markerHitsSql(wordsSql(), TextQ.StopWords)} AS stops
         | FROM n)
         |SELECT doc_id, n_chars, stops FROM d b
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM d a
         |  WHERE a.n_chars >= b.n_chars AND a.stops <= b.stops
         |    AND (a.n_chars > b.n_chars OR a.stops < b.stops))
         |ORDER BY doc_id""".stripMargin,

    "p15_shard_manifest" -> {
      val id = "CAST(doc_id AS VARCHAR)"
      s"""WITH h AS (
         |  SELECT doc_id,
         |    CAST(${saltedHash32Sql(id, 0)} % 8 AS INT) AS shard,
         |    ${saltedHash32Sql(id, 1)} AS ord
         |  FROM documents)
         |SELECT doc_id, shard,
         |  row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id)
         |    AS pos
         |FROM h ORDER BY shard, pos""".stripMargin
    },

    "p16_weighted_panel" -> {
      val h = saltedHash32Sql("CAST(doc_id AS VARCHAR)", 7)
      s"""WITH kk AS (
         |  SELECT doc_id, n_chars,
         |    CAST(round(ln(($h + 1) / 4294967296.0) * 1e9) AS BIGINT)
         |      AS lnu_nano
         |  FROM documents)
         |SELECT doc_id, n_chars,
         |  CAST(lnu_nano AS DOUBLE) / CAST(n_chars AS DOUBLE) AS samp_key
         |FROM kk ORDER BY samp_key DESC, doc_id LIMIT 50""".stripMargin
    },

    "p17_temperature_mixture" -> {
      val h = saltedHash32Sql("CAST(doc_id AS VARCHAR)", 0)
      s"""WITH c AS (
         |  SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
         |i AS (
         |  SELECT source, n, CAST(floor(sqrt(n)) AS BIGINT) AS isq
         |  FROM c),
         |r AS (
         |  SELECT source, n,
         |    CAST(isq * 10000 // (SELECT SUM(isq) FROM i) AS BIGINT)
         |      AS share_bp
         |  FROM i),
         |r2 AS (
         |  SELECT source, n, share_bp,
         |    LEAST(10000, 300 * share_bp // n) AS rate_bp
         |  FROM r),
         |k AS (
         |  SELECT d.source, COUNT(*) AS n_kept
         |  FROM documents d JOIN r2 USING (source)
         |  WHERE ($h) % 10000 < rate_bp
         |  GROUP BY 1)
         |SELECT r2.source, r2.n, r2.share_bp,
         |  CAST(r2.rate_bp AS BIGINT) AS rate_bp,
         |  COALESCE(k.n_kept, 0) AS n_kept
         |FROM r2 LEFT JOIN k USING (source) ORDER BY source""".stripMargin
    },

    // p07's mirror chain, attributing instead of filtering: the same
    // lab/cont/rep CTEs, the same exact-integer bp (zero-denominator
    // guarded by the CASE order), one CASE in the chain's own stage
    // order, rolled up per stage
    "p18_removal_audit" ->
      s"""${DedupQ.lshCtes.replaceFirst("^WITH ", "WITH RECURSIVE ")},
         |pe AS (SELECT a AS src, b AS dst FROM j UNION SELECT b, a FROM j),
         |reach(node, r) AS (
         |  SELECT src, src FROM pe
         |  UNION
         |  SELECT pe.dst, reach.r FROM reach JOIN pe ON pe.src = reach.node),
         |lab AS (SELECT node AS member, MIN(r) AS cluster
         |        FROM reach GROUP BY node),
         |sh8 AS (SELECT doc_id, ${shinglesNSql("w", 8)} AS s8 FROM w
         |        WHERE len(w) >= 8),
         |tok8 AS (SELECT DISTINCT doc_id, t
         |         FROM (SELECT doc_id, unnest(s8) AS t FROM sh8)
         |         WHERE t <> ''),
         |bg AS (SELECT DISTINCT t FROM tok8 WHERE doc_id % 10 = 7),
         |cont AS (SELECT DISTINCT c.doc_id FROM tok8 c JOIN bg USING (t)
         |         WHERE c.doc_id % 10 <> 7),
         |rep AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
         |         COUNT(*) AS n_distinct
         |        FROM (SELECT doc_id, s, COUNT(*) AS c
         |              FROM (SELECT doc_id, unnest(sh) AS s FROM sh)
         |              WHERE s <> '' GROUP BY doc_id, s)
         |        GROUP BY doc_id),
         |qn AS (SELECT d.doc_id, d.n_chars,
         |        len(regexp_extract_all(d.text, '[^a-zA-Z0-9 ]')) AS punct,
         |        CASE WHEN n.norm = '' THEN 0 ELSE len(w.w) END AS n_tok,
         |        ${markerHitsSql("w.w", TextQ.StopWords)} AS stops
         |       FROM documents d
         |       JOIN n ON n.doc_id = d.doc_id
         |       JOIN w ON w.doc_id = d.doc_id),
         |base AS (
         | SELECT q.doc_id,
         |  CASE WHEN lab.member IS NOT NULL AND lab.cluster <> q.doc_id
         |        THEN 'dedup_loser'
         |       WHEN q.doc_id % 10 = 7 THEN 'holdout'
         |       WHEN q.doc_id IN (SELECT doc_id FROM cont)
         |        THEN 'contaminated'
         |       WHEN rep.doc_id IS NOT NULL
         |            AND rep.n_distinct * 10 < rep.n_grams * 8
         |        THEN 'repetitive'
         |       WHEN q.n_tok = 0 THEN 'empty'
         |       WHEN (2 * (40 * least(q.n_tok, 100) * q.n_tok * q.n_chars
         |              + 3000 * (q.n_tok - q.stops) * q.n_chars
         |              + 3000 * (q.n_chars - q.punct) * q.n_tok)
         |             + q.n_tok * q.n_chars)
         |            // (2 * q.n_tok * q.n_chars) < 4000
         |        THEN 'low_quality'
         |       ELSE 'kept' END AS stage
         | FROM qn q
         | LEFT JOIN lab ON lab.member = q.doc_id
         | LEFT JOIN rep ON rep.doc_id = q.doc_id)
         |SELECT stage, COUNT(*) AS n_docs,
         | CAST(SUM(doc_id % 9973) AS BIGINT) AS id_checksum
         |FROM base GROUP BY stage ORDER BY stage""".stripMargin,

    // the engine's level choice replayed in SQL: per-level group counts
    // from one unioned expansion (= the engine's explode), the finest
    // level with suppressed-rows <= 1% of the table (COALESCE -> the
    // coarsest level when none qualifies), then the suppressed-residue
    // collapse re-grouped exactly like Anonymize.kAnonymousGroups.
    "p19_k_anonymous_release" ->
      """WITH q AS (
        |  SELECT CAST(c_nationkey AS VARCHAR) AS n0, c_mktsegment AS s0,
        |    CAST(CAST(FLOOR(c_acctbal/100) AS BIGINT) AS VARCHAR) AS b0,
        |    CAST(CAST(FLOOR(c_acctbal/1000) AS BIGINT) AS VARCHAR) AS b1,
        |    CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'nonneg' END AS bs
        |  FROM customer),
        |lv AS (
        |  SELECT 0 AS lvl, n0 AS a, s0 AS b, b0 AS c FROM q
        |  UNION ALL SELECT 1, n0, s0, b1 FROM q
        |  UNION ALL SELECT 2, n0, s0, bs FROM q
        |  UNION ALL SELECT 3, n0, '*', '*' FROM q
        |  UNION ALL SELECT 4, '*', '*', '*' FROM q),
        |g AS (SELECT lvl, a, b, c, COUNT(*) AS n FROM lv
        |      GROUP BY lvl, a, b, c),
        |sup AS (SELECT lvl, COALESCE(SUM(CASE WHEN n < 8 THEN n END), 0)
        |               AS s FROM g GROUP BY lvl),
        |tot AS (SELECT COUNT(*) AS t FROM customer),
        |chosen AS (SELECT COALESCE(
        |    (SELECT MIN(lvl) FROM sup, tot WHERE s <= 0.01 * t), 4) AS lvl),
        |rel AS (
        |  SELECT CASE WHEN g.n >= 8 THEN a ELSE '*' END AS nation,
        |         CASE WHEN g.n >= 8 THEN b ELSE '*' END AS segment,
        |         CASE WHEN g.n >= 8 THEN c ELSE '*' END AS bal_band,
        |         g.n
        |  FROM g JOIN chosen ON g.lvl = chosen.lvl)
        |SELECT nation, segment, bal_band, CAST(SUM(n) AS BIGINT) AS n,
        |       (SELECT CAST(lvl AS INT) FROM chosen) AS lvl
        |FROM rel GROUP BY nation, segment, bal_band
        |ORDER BY nation, segment, bal_band""".stripMargin
  )
}
