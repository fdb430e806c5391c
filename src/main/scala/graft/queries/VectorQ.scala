package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity
import SqlMacros._

/** Similarity search over the embeddings table: exact brute-force cosine
  * top-k (baseline) and the sign-bit-bucketed ANN probe (scale path — with
  * data bucketed by the sign signature, a probe scans one bucket instead of
  * the full table).
  */
object VectorQ extends QueryPack {

  /** Components used for the deterministic sign-bit bucket. */
  val BucketPositions: Seq[Int] = Seq(1, 17, 33, 49)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v01_knn_bruteforce" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
      Similarity.bruteForceTopK(
          e.filter(col("vec_id") =!= 0),
          e.filter(col("vec_id") === 0),
          "vec_id", "embedding", 10)
        .select(col("vec_id"), col("label"), col("cos4"))
        .orderBy(col("cos4").desc, col("vec_id"))
    },

    "v02_ann_bucket_probe" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val q = e.filter(col("vec_id") === 0)
      val eb = e.filter(col("vec_id") =!= 0)
        .withColumn("bucket", Similarity.signBucket(col("embedding"), BucketPositions))
      val qb = broadcast(q.select(col("embedding").as("__qvec"),
        Similarity.signBucket(col("embedding"), BucketPositions).as("qbucket")))
      import graft.functions.vectors
      eb.crossJoin(qb)
        .filter(col("bucket") === col("qbucket"))
        .withColumn("cos4", round(vectors.cosine(
          vectors.asDouble(col("embedding")), vectors.asDouble(col("__qvec"))), 4))
        .select(col("vec_id"), col("bucket"), col("cos4"))
        .orderBy(col("cos4").desc, col("vec_id"))
        .limit(5)
    },

    "v03_bucket_histogram" -> { (s, dir) =>
      Tables(s, dir).embeddings
        .withColumn("bucket", Similarity.signBucket(col("embedding"), BucketPositions))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    },

    // Multi-probe IVF: scan the query's 2 nearest cells instead of 1 —
    // the recall/scan-width knob.
    "v06_ivf_multiprobe" -> { (s, dir) =>
      import graft.functions.vectors
      val e = Tables(s, dir).embeddings
      val cb = codebook(e)
      val q = e.filter(col("vec_id") === 0)
      val qb = broadcast(q.select(col("embedding").as("__qvec"),
        Similarity.ivfProbeCells(col("embedding"), cb, 2).as("qcells")))
      e.filter(col("vec_id") =!= 0)
        .withColumn("cell", Similarity.ivfCell(col("embedding"), cb))
        .crossJoin(qb)
        .filter(array_contains(col("qcells"), col("cell")))
        .withColumn("cos4", round(vectors.cosine(
          vectors.asDouble(col("embedding")), vectors.asDouble(col("__qvec"))), 4))
        .select(col("vec_id"), col("cell"), col("cos4"))
        .orderBy(col("cos4").desc, col("vec_id"))
        .limit(5)
    },

    // v06 through an index AT REST (Similarity.writeIvfIndex): identical
    // multiprobe semantics, but the corpus is written partitioned by
    // cell once and the probe's `cell IN (…)` literals prune to the 2
    // probed directories at PLANNING time — the scan never touches the
    // other cells (IndexSpec pins numPartitions = nprobe on the scan
    // metrics). Like r08/s02 the write is part of the query: a corrupted
    // partition layout would hash-mismatch the oracle. The probe cells
    // come from the SAME ivfProbeCells expression the online probes use,
    // evaluated on the 1-row query frame (a bounded driver collect, like
    // the codebook itself) so the driver can't disagree with the engine
    // on rounding/tiebreaks.
    "v11_ivf_partitioned_probe" -> { (s, dir) =>
      import graft.functions.vectors
      val e = Tables(s, dir).embeddings
      val cb = codebook(e)
      val q = e.filter(col("vec_id") === 0)
      val cells = q.select(
          Similarity.ivfProbeCells(col("embedding"), cb, 2).as("c"))
        .collect()(0).getSeq[Int](0)
      Similarity.writeIvfIndex(e.filter(col("vec_id") =!= 0), "embedding",
        cb, "graft_ivf_idx")
      val qb = broadcast(q.select(col("embedding").as("__qvec")))
      graft.sources.Warehouse.read(s, "graft_ivf_idx")
        .filter(col("cell").isin(cells: _*))
        .crossJoin(qb)
        .withColumn("cos4", round(vectors.cosine(
          vectors.asDouble(col("embedding")), vectors.asDouble(col("__qvec"))), 4))
        .select(col("vec_id"), col("cell"), col("cos4"))
        .orderBy(col("cos4").desc, col("vec_id"))
        .limit(5)
    },

    // One distributed Lloyd iteration over the full table (codebook =
    // vectors 1..8): per-cell quantized component means, long form.
    "v05_kmeans_step" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
      Similarity.kmeansStep(e, "embedding", codebook(e))
        .orderBy(col("cell"), col("idx"))
    },

    // INDEX MAINTENANCE (Similarity.appendIvfIndex): build the at-rest
    // IVF index from 4/5 of the corpus, APPEND the remaining fifth with
    // the frozen centroids (existing files untouched, O(delta) write),
    // then run the v06/v11 probe over the appended index. The oracle is
    // the SAME full-corpus multiprobe mirror as v06/v11: hash equality
    // proves the append lost no rows, re-assigned no cells, and left
    // probing indistinguishable from a from-scratch build — the s13 IVM
    // doctrine applied to a vector index.
    "v27_ivf_append" -> { (s, dir) =>
      import graft.functions.vectors
      val e = Tables(s, dir).embeddings
      val cb = codebook(e)
      val corpus = e.filter(col("vec_id") =!= 0)
      Similarity.writeIvfIndex(corpus.filter(col("vec_id") % 5 =!= 3),
        "embedding", cb, "graft_ivf_idx_inc")
      Similarity.appendIvfIndex(corpus.filter(col("vec_id") % 5 === 3),
        "embedding", cb, "graft_ivf_idx_inc")
      val q = e.filter(col("vec_id") === 0)
      val cells = q.select(
          Similarity.ivfProbeCells(col("embedding"), cb, 2).as("c"))
        .collect()(0).getSeq[Int](0)
      val qb = broadcast(q.select(col("embedding").as("__qvec")))
      graft.sources.Warehouse.read(s, "graft_ivf_idx_inc")
        .filter(col("cell").isin(cells: _*))
        .crossJoin(qb)
        .withColumn("cos4", round(vectors.cosine(
          vectors.asDouble(col("embedding")), vectors.asDouble(col("__qvec"))), 4))
        .select(col("vec_id"), col("cell"), col("cos4"))
        .orderBy(col("cos4").desc, col("vec_id"))
        .limit(5)
    },

    // INDEX MAINTENANCE, the other half (Compaction.compactHotPartitions
    // composed with appendIvfIndex — VERDICT r11 #6): v27's append
    // accretes one file per batch per touched cell; here the index is
    // built 3/5 + TWO append batches (hot cells now at 3 files), then
    // hot-cell compacted IN PLACE (only hot dirs rewritten, O(hot) not
    // O(index)), then probed. Same full-corpus multiprobe mirror: hash
    // equality proves compaction lost/duplicated nothing and left
    // pruning + probing indistinguishable; CompactionSpec pins the
    // file-count and partition-pruning contracts.
    "v28_ivf_compact" -> { (s, dir) =>
      import graft.functions.vectors
      val e = Tables(s, dir).embeddings
      val cb = codebook(e)
      val corpus = e.filter(col("vec_id") =!= 0)
      Similarity.writeIvfIndex(corpus.filter(col("vec_id") % 5 < 3),
        "embedding", cb, "graft_ivf_idx_cmp")
      Similarity.appendIvfIndex(corpus.filter(col("vec_id") % 5 === 3),
        "embedding", cb, "graft_ivf_idx_cmp")
      Similarity.appendIvfIndex(corpus.filter(col("vec_id") % 5 === 4),
        "embedding", cb, "graft_ivf_idx_cmp")
      graft.sources.Compaction.compactHotPartitions(s, "graft_ivf_idx_cmp",
        "cell", targetRows = 1000000L)
      val q = e.filter(col("vec_id") === 0)
      val cells = q.select(
          Similarity.ivfProbeCells(col("embedding"), cb, 2).as("c"))
        .collect()(0).getSeq[Int](0)
      val qb = broadcast(q.select(col("embedding").as("__qvec")))
      graft.sources.Warehouse.read(s, "graft_ivf_idx_cmp")
        .filter(col("cell").isin(cells: _*))
        .crossJoin(qb)
        .withColumn("cos4", round(vectors.cosine(
          vectors.asDouble(col("embedding")), vectors.asDouble(col("__qvec"))), 4))
        .select(col("vec_id"), col("cell"), col("cos4"))
        .orderBy(col("cos4").desc, col("vec_id"))
        .limit(5)
    },

    // Product quantization codes (m=4 subspaces over the 64-dim vectors,
    // codewords = the codebook vectors' slices): the 100 TB vector-
    // compression step — 4 small codes replace the vector in candidate
    // scans. Exact-integer distances (1e-6 quantized deltas) make the
    // argmin bit-stable across engines.
    "v07_pq_codes" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
      Similarity.pqEncode(e.filter(col("vec_id") =!= 0),
          "vec_id", "embedding", codebook(e), m = PqSubspaces)
        .orderBy(col("vec_id"))
    },

    // PQ asymmetric-distance search: approximate top-10 by summed
    // per-subspace LUT entries over the v07 codes — the scan reads ONLY
    // the 4 codes per row (the point of PQ at 100 TB). Exact-integer LUT
    // (evaluated by Spark itself) keeps the ranking bit-stable.
    "v08_pq_adc_topk" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
      // the query vector is a one-row driver constant, like the codebook
      val qvec = e.filter(col("vec_id") === 0).select(col("embedding"))
        .collect()(0).getSeq[Float](0).map(_.toDouble).toArray
      Similarity.pqAdcTopK(e.filter(col("vec_id") =!= 0), "vec_id",
          "embedding", codebook(e), qvec, m = PqSubspaces, k = 10)
        .orderBy(col("adc"), col("vec_id"))
    },

    // v08 through a codes table AT REST: pqEncode materialized once as a
    // managed table holding ONLY (vec_id, c1..c4) — the vectors are not
    // in the table, so the ADC scan physically cannot read them; its
    // per-row input is 4 ints standing in for 64 floats (the PQ
    // compression claim, enforced by storage instead of asserted in a
    // comment — the spec pins the table's bytes at a fraction of the
    // raw embeddings'). Same ranking as the fused v08 (shared mirror).
    "v12_pq_codes_at_rest" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val cb = codebook(e)
      val qvec = e.filter(col("vec_id") === 0).select(col("embedding"))
        .collect()(0).getSeq[Float](0).map(_.toDouble).toArray
      graft.sources.Warehouse.writeTable(
        Similarity.pqEncode(e.filter(col("vec_id") =!= 0), "vec_id",
          "embedding", cb, m = PqSubspaces),
        "graft_pq_codes")
      Similarity.pqAdcTopKFromCodes(
          graft.sources.Warehouse.read(s, "graft_pq_codes"), "vec_id",
          cb, qvec, m = PqSubspaces, k = 10)
        .orderBy(col("adc"), col("vec_id"))
    },

    // The COMPOSED production ANN path (IVF-ADC) — what v02–v08's pieces
    // exist for: IVF probe prunes the scan to the query's 2 nearest
    // cells, PQ ADC code arithmetic shortlists 20 candidates, and only
    // those get an exact cosine re-rank. At 100 TB: cell filter =
    // partition pruning, ADC scan = codes only, exact re-rank = 20 rows.
    "v09_ivf_pq_rerank" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val qvec = e.filter(col("vec_id") === 0).select(col("embedding"))
        .collect()(0).getSeq[Float](0).map(_.toDouble).toArray
      Similarity.ivfPqTopK(e.filter(col("vec_id") =!= 0), "vec_id",
          "embedding", codebook(e), qvec, m = PqSubspaces, k = 5,
          nprobe = 2, shortlist = 20)
        .select(col("vec_id"), col("cos4"))
        .orderBy(col("cos4").desc, col("vec_id"))
    },

    // IVF probe: deterministic codebook = vectors 1..8; assign every
    // vector to its nearest centroid (per-row codegen over the broadcast
    // codebook — no join/shuffle), then scan only the query's cell.
    // Diversity-capped selection (the "semantic dedup" shape of corpus
    // curation): assign every vector to its nearest centroid cell — a
    // per-row codegen expression, no join/shuffle — and keep at most 40
    // per cell in deterministic md5-bucket order. Dense regions are
    // downsampled to the cap, sparse regions survive whole; one window
    // per cell, parallelism = cell count (salt the window per
    // operators.Skew if one cell dominates at scale).
    "v10_diversity_cap" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cell"))
        .orderBy(graft.operators.Splits.pctBucket(col("vec_id"), 9),
          col("vec_id"))
      e.filter(col("vec_id") =!= 0)
        .withColumn("cell", Similarity.ivfCell(col("embedding"), codebook(e)))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 40)
        .select(col("vec_id"), col("cell"), col("rn"))
        .orderBy(col("vec_id"))
    },

    // Int8 scalar quantization (SQ8) top-k: symmetric corpus-max scale
    // (a bounded driver constant), per-row round(x·127/s) codes, exact
    // integer dot against the quantized query — the codebook-free 4×
    // compression rung below PQ (v07/v08). Fused per-row codegen scan +
    // TakeOrdered: no join, no shuffle; bit-stable integer scores.
    "v13_sq8_topk" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val scale = Similarity.sq8MaxAbs(e, "embedding")
      val qvec = e.filter(col("vec_id") === 0).select(col("embedding"))
        .collect()(0).getSeq[Float](0).map(_.toDouble).toArray
      Similarity.sq8TopK(e.filter(col("vec_id") =!= 0), "vec_id",
          "embedding", qvec, scale, k = 10)
        .orderBy(col("score").desc, col("vec_id"))
    },

    // v13 through a codes table AT REST (the v12 pattern for SQ8): the
    // corpus quantized ONCE to array<tinyint> codes and materialized as
    // a managed table holding only (vec_id, codes) — ¼ the vector bytes
    // by column type, with the vectors physically absent, so the
    // codes-only-scan claim is enforced by storage. Same ranking as the
    // fused v13 (shared mirror).
    "v14_sq8_codes_at_rest" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val scale = Similarity.sq8MaxAbs(e, "embedding")
      val qvec = e.filter(col("vec_id") === 0).select(col("embedding"))
        .collect()(0).getSeq[Float](0).map(_.toDouble).toArray
      graft.sources.Warehouse.writeTable(
        Similarity.sq8Encode(e.filter(col("vec_id") =!= 0), "vec_id",
          "embedding", scale),
        "graft_sq8_codes")
      Similarity.sq8TopKFromCodes(
          graft.sources.Warehouse.read(s, "graft_sq8_codes"), "vec_id",
          qvec, scale, k = 10)
        .orderBy(col("score").desc, col("vec_id"))
    },

    // Johnson–Lindenstrauss compressed-domain search, composed like
    // v09: 64-dim floats sketched to 16 exact-integer ±1 projections
    // (Similarity.signedProjection — per-row kernel, md5-derived sign
    // matrix, no shuffle), integer-dot shortlist of 100, then exact
    // cosine re-ranks the top 10. The sketch phase moves/compares 16
    // longs per row instead of 64 floats; recall is corpus-bound (JL
    // noise ∝ 1/√k — built for dim ≫ k deployments; spec-pinned at
    // this adversarially-uniform corpus's observed level), while the
    // re-rank makes the surfaced scores exact.
    "v15_random_projection" -> { (s, dir) =>
      import graft.functions.vectors
      val e = Tables(s, dir).embeddings
      val signs = Similarity.md5Signs(16, 64)
      val proj = Similarity.signedProjection(col("embedding"), signs)
      val qb = broadcast(e.filter(col("vec_id") === 0)
        .select(proj.as("__qp"), col("embedding").as("__qvec")))
      // corpus leg: widened scan (single-row-group local file — the g10
      // pathology: 7.2 s single-task at sf1) + quantize-once so the
      // interpreted HOF tree doesn't re-round each component 16×
      Tables(s, dir).embeddingsKernelParallel
        .filter(col("vec_id") =!= 0)
        .withColumn("__q", Similarity.quantizeMicro(col("embedding")))
        .withColumn("p",
          Similarity.signedProjectionQuantized(col("__q"), signs))
        .drop("__q")
        .crossJoin(qb)
        .withColumn("pscore", Similarity.projectionDot(col("p"), col("__qp")))
        .orderBy(col("pscore").desc, col("vec_id"))
        .limit(100)
        .withColumn("cos4", round(vectors.cosine(
          vectors.asDouble(col("embedding")),
          vectors.asDouble(col("__qvec"))), 4))
        .select(col("vec_id"), col("pscore"), col("cos4"))
        .orderBy(col("cos4").desc, col("vec_id"))
        .limit(10)
    },

    // MMR diversified re-rank (λ=0.7): top-25 relevance shortlist, then
    // the greedy marginal-relevance walk picks 10 — exact integer
    // scoring at ten-thousandth granularity, replayed step-for-step by
    // the oracle's recursive CTE (per-step argmax via correlated
    // LIMIT-1 subqueries). Distributed shortlist + pairwise sims;
    // driver walk is bounded O(shortlist²) integers (operator doc).
    "v16_mmr_rerank" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
      Similarity.mmrTopK(
          e.filter(col("vec_id") =!= 0),
          e.filter(col("vec_id") === 0),
          "vec_id", "embedding", shortlist = 25, k = 10,
          lamNum = 7, lamDen = 10)
        .orderBy(col("rank"))
    },

    // ANN recall harness — the evaluation operator every index tuning
    // loop needs: for a 5-query panel, exact brute-force top-10 vs the
    // nprobe=1 IVF probe's top-10, reported as hits and recall basis
    // points per query. Both legs FUSE into one pass over one scored
    // frame (corpus × broadcast panel): a single window carries
    // row_number (the exact rank) AND a running conditional count of
    // cell-matching rows (the probe rank — ranking the filtered subset
    // without ranking-after-filter, which would sit below its own
    // exchange, defeat exchange reuse, and cost a second corpus scan).
    // A row is in the intersection iff rk ≤ k ∧ cell-match ∧ prank ≤ k,
    // so recall falls out of a groupBy with no join. At 100 TB the
    // panel stays a broadcast constant; recall@k needs the exact leg by
    // definition, which is why eval runs on a sampled corpus slice
    // while production serves from the index (v11's at-rest layout).
    "v17_ann_recall" -> { (s, dir) =>
      import graft.functions.vectors
      import org.apache.spark.sql.expressions.Window
      val e = Tables(s, dir).embeddings
      val cb = codebook(e)
      val qids = RecallQueryIds
      val panel = broadcast(e.filter(col("vec_id").isin(qids: _*))
        .select(col("vec_id").as("qid"), col("embedding").as("__qvec"),
          Similarity.ivfCell(col("embedding"), cb).as("qcell")))
      val scored = e.filter(!col("vec_id").isin(qids: _*))
        .withColumn("cell", Similarity.ivfCell(col("embedding"), cb))
        .crossJoin(panel)
        .withColumn("cos4", round(vectors.cosine(
          vectors.asDouble(col("embedding")),
          vectors.asDouble(col("__qvec"))), 4))
        .select(col("qid"), col("vec_id"), col("cell"), col("qcell"),
          col("cos4"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos4").desc, col("vec_id"))
      scored
        .withColumn("rk", row_number().over(w))
        .withColumn("prank", sum(when(col("cell") === col("qcell"), 1)
          .otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("rk") <= 10)
        .groupBy(col("qid"))
        .agg(sum(when(col("cell") === col("qcell") && col("prank") <= 10, 1L)
          .otherwise(0L)).cast("bigint").as("n_hit"))
        .withColumn("recall_bp", col("n_hit") * 1000)
        .orderBy(col("qid"))
    },

    // Matryoshka-truncation recall — the "how much recall do I lose if
    // I read only the first 16 of 64 dims" eval behind MRL-style
    // embedding storage (truncated dims = 4× less vector I/O at rest,
    // the cheapest ANN lever there is). Same one-pass harness shape as
    // v17, but the candidate leg is a different RANKING of the same
    // rows, not a filter: two row_numbers over the SAME qid
    // partitioning (full-dim and truncated-dim order) — Spark plans
    // one exchange and two in-partition sorts, no second scan — and a
    // row is in the intersection iff both ranks are ≤ k.
    "v18_matryoshka_recall" -> { (s, dir) =>
      import graft.functions.vectors
      import org.apache.spark.sql.expressions.Window
      val e = Tables(s, dir).embeddings
      val qids = RecallQueryIds
      val panel = broadcast(e.filter(col("vec_id").isin(qids: _*))
        .select(col("vec_id").as("qid"), col("embedding").as("__qvec")))
      val scored = e.filter(!col("vec_id").isin(qids: _*))
        .crossJoin(panel)
        .withColumn("cos4", round(vectors.cosine(
          vectors.asDouble(col("embedding")),
          vectors.asDouble(col("__qvec"))), 4))
        .withColumn("tcos4", round(vectors.cosine(
          vectors.asDouble(slice(col("embedding"), 1, 16)),
          vectors.asDouble(slice(col("__qvec"), 1, 16))), 4))
        .select(col("qid"), col("vec_id"), col("cos4"), col("tcos4"))
      val wq = Window.partitionBy(col("qid"))
      val full = wq.orderBy(col("cos4").desc, col("vec_id"))
      val trunc = wq.orderBy(col("tcos4").desc, col("vec_id"))
      scored
        .withColumn("rkf", row_number().over(full))
        .withColumn("rkt", row_number().over(trunc))
        .filter(col("rkf") <= 10 || col("rkt") <= 10)
        .groupBy(col("qid"))
        .agg(sum(when(col("rkf") <= 10 && col("rkt") <= 10, 1L)
          .otherwise(0L)).cast("bigint").as("n_hit"))
        .withColumn("recall_bp", col("n_hit") * 1000)
        .orderBy(col("qid"))
    },

    // Semi-supervised label transfer: every 50th vector plays the
    // unlabeled query, its 10 nearest labeled neighbors vote
    // (Similarity.knnVoteLabel doc: broadcast panel, deterministic
    // rank/vote tiebreaks, IVF-shortlist composition at corpus scale).
    "v19_knn_vote_label" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
      Similarity.knnVoteLabel(
          e.filter(col("vec_id") % 50 =!= 0),
          e.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", "label", k = 10)
        .orderBy(col("qid"))
    },

    // BATCH IVF serving: a query PANEL probes in one equi-join on the
    // cell key — each corpus row meets only the queries assigned to
    // ITS cell (vs v01's every-query brute force); the panel
    // broadcasts with precomputed cells, per-query top-5 by window.
    // Against the v11 cell-partitioned at-rest corpus the scan prunes
    // to the union of panel cells at planning time — this is the
    // online-serving shape of the v04 single-query probe.
    "v20_ivf_batch_probe" -> { (s, dir) =>
      import graft.functions.vectors
      import org.apache.spark.sql.expressions.Window
      val e = Tables(s, dir).embeddings
      val cb = codebook(e)
      val q = broadcast(e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"),
          vectors.asDouble(col("embedding")).as("__qv"),
          Similarity.ivfCell(col("embedding"), cb).as("cell")))
      val c = e.filter(col("vec_id") % 50 =!= 0)
        .withColumn("cell", Similarity.ivfCell(col("embedding"), cb))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos4").desc, col("vec_id"))
      c.join(q, Seq("cell"))
        .withColumn("cos4", round(vectors.cosine(
          vectors.asDouble(col("embedding")), col("__qv")), 4))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("qid"), col("vec_id"), col("cell"), col("cos4"),
          col("rk"))
        .orderBy(col("qid"), col("rk"))
    },

    // Quantization ABLATION — the "what does int8 cost in recall"
    // eval every quantized deployment runs before committing to codes
    // at rest (v13/v14): rank the corpus per panel query by exact
    // rounded cosine AND by the exact-integer SQ8 dot (both sides
    // encoded with the half-away kernel rounding), then recall@10 of
    // the quantized ranking against the exact one. One scored frame,
    // two in-partition rankings (the v18 two-row_number shape — one
    // exchange, no second scan). The generic zip_with dot here is the
    // EVAL harness; serving uses the fused Sq8Dot kernel (v13).
    "v22_quant_ablation" -> { (s, dir) =>
      import graft.functions.vectors
      import org.apache.spark.sql.expressions.Window
      val e = Tables(s, dir).embeddings
      val scale = Similarity.sq8MaxAbs(e, "embedding")
      val qids = RecallQueryIds
      def codes(c: org.apache.spark.sql.Column) =
        graft.plans.Sq8Dot.sq8Encode(vectors.asDouble(c), scale)
      val panel = broadcast(e.filter(col("vec_id").isin(qids: _*))
        .select(col("vec_id").as("qid"),
          vectors.asDouble(col("embedding")).as("__qv"),
          codes(col("embedding")).as("__qc")))
      val scored = e.filter(!col("vec_id").isin(qids: _*))
        .select(col("vec_id"), vectors.asDouble(col("embedding")).as("__v"),
          codes(col("embedding")).as("__c"))
        .crossJoin(panel)
        .select(col("qid"), col("vec_id"),
          round(vectors.cosine(col("__v"), col("__qv")), 4).as("cos4"),
          aggregate(zip_with(col("__c"), col("__qc"),
            (a, b) => a.cast("long") * b.cast("long")),
            lit(0L), (acc, x) => acc + x).as("qscore"))
      val wq = Window.partitionBy(col("qid"))
      val exact = wq.orderBy(col("cos4").desc, col("vec_id"))
      val quant = wq.orderBy(col("qscore").desc, col("vec_id"))
      scored
        .withColumn("rkf", row_number().over(exact))
        .withColumn("rkq", row_number().over(quant))
        .filter(col("rkf") <= 10 || col("rkq") <= 10)
        .groupBy(col("qid"))
        .agg(sum(when(col("rkf") <= 10 && col("rkq") <= 10, 1L)
          .otherwise(0L)).cast("bigint").as("n_hit"))
        .withColumn("recall_bp", col("n_hit") * 1000)
        .orderBy(col("qid"))
    },

    // FILTERED vector search — the hybrid metadata+ANN serving shape
    // (the "where label = X" predicate every production vector store
    // composes with the index): v06's 2-cell multiprobe with the label
    // filter applied BEFORE scoring, so only in-cell in-label rows pay
    // the cosine; against the v11 at-rest layout the cell prunes
    // partitions and the label filter pushes into the pruned scan.
    "v21_filtered_ann" -> { (s, dir) =>
      import graft.functions.vectors
      val e = Tables(s, dir).embeddings
      val cb = codebook(e)
      val q = e.filter(col("vec_id") === 0)
      val qb = broadcast(q.select(col("embedding").as("__qvec"),
        Similarity.ivfProbeCells(col("embedding"), cb, 2).as("qcells")))
      e.filter(col("vec_id") =!= 0 && col("label") === 3)
        .withColumn("cell", Similarity.ivfCell(col("embedding"), cb))
        .crossJoin(qb)
        .filter(array_contains(col("qcells"), col("cell")))
        .withColumn("cos4", round(vectors.cosine(
          vectors.asDouble(col("embedding")),
          vectors.asDouble(col("__qvec"))), 4))
        .select(col("vec_id"), col("label"), col("cell"), col("cos4"))
        .orderBy(col("cos4").desc, col("vec_id"))
        .limit(5)
    },

    "v04_ivf_probe" -> { (s, dir) =>
      import graft.functions.vectors
      val e = Tables(s, dir).embeddings
      val cb = codebook(e)
      val q = e.filter(col("vec_id") === 0)
      val qb = broadcast(q.select(col("embedding").as("__qvec"),
        Similarity.ivfCell(col("embedding"), cb).as("qcell")))
      e.filter(col("vec_id") =!= 0)
        .withColumn("cell", Similarity.ivfCell(col("embedding"), cb))
        .crossJoin(qb)
        .filter(col("cell") === col("qcell"))
        .withColumn("cos4", round(vectors.cosine(
          vectors.asDouble(col("embedding")), vectors.asDouble(col("__qvec"))), 4))
        .select(col("vec_id"), col("cell"), col("cos4"))
        .orderBy(col("cos4").desc, col("vec_id"))
        .limit(5)
    },

    // Full Lloyd k-means TRAINING (v05 is a single step): 2 rounds of
    // assignment + quantized-mean recompute from the fixed init (ids
    // 1..CodebookSize, empty cells keep their centroid), then the
    // ROUND-3 assignment stats over the trained codebook are the
    // checked output — so the oracle replays every round, not just the
    // last. Per round: one corpus pass (per-row kernel assignment into
    // one map-side-combined aggregate) + a K·dim driver collect (the
    // codebook is the model artifact). This trained codebook is what
    // the IVF/PQ paths (v09/v11) consume; recall@10 delta vs the
    // untrained init is measured in KmeansTrainSpec.
    "v23_kmeans_train" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
      // training rounds are the kernel-heavy corpus passes — widened
      // scan (partitioning-free semantics: order-free integer sums)
      val corpus = Tables(s, dir).embeddingsKernelParallel
      val trained = Similarity.kmeansTrain(corpus, "embedding",
        codebook(e), rounds = KmeansTrainRounds)
      Similarity.kmeansStep(corpus, "embedding", trained)
        .orderBy(col("cell"), col("idx"))
    },

    // PQ codebook TRAINING (v07/v08/v09 encode against FIXED init
    // slices): 2 rounds of independent per-subspace Lloyd — assignment
    // by the SAME exact-integer-L2 PqEncode kernel the encoder ships,
    // 1e-6-quantized sub-codeword means, empty (subspace, codeword)
    // pairs keep their slice — then the ROUND-3 per-subspace assignment
    // stats over the trained codebook are the checked output, so the
    // oracle replays every round (v23's doctrine, per subspace).
    // Quantization-error delta vs the untrained init is measured in
    // PqTrainSpec.
    "v24_pq_train" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val corpus = Tables(s, dir).embeddingsKernelParallel // v23 doctrine
      val trained = Similarity.pqTrain(corpus, "embedding", codebook(e),
        PqSubspaces, KmeansTrainRounds)
      Similarity.pqStep(corpus, "embedding", trained, PqSubspaces)
        .orderBy(col("j"), col("cell"), col("idx"))
    },

    // TRAINED end-to-end ANN: v23's full-Lloyd training feeds the
    // composed v09 search path (IVF probe → PQ-ADC shortlist → exact
    // re-rank) — the oracle replays BOTH the training rounds and the
    // whole search chain over the trained centroids, so "the index the
    // model trained is the index the query uses" is hash-checked, not
    // just spec-asserted (IvfPqTrainedSpec holds the measured recall
    // delta: 5 → 14 hits over the v17 panel).
    "v25_trained_ivf_pq" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val corpus = Tables(s, dir).embeddingsKernelParallel // v23 doctrine
      val qvec = e.filter(col("vec_id") === 0).select(col("embedding"))
        .collect()(0).getSeq[Float](0).map(_.toDouble).toArray
      val trained = Similarity.kmeansTrain(corpus, "embedding",
        codebook(e), KmeansTrainRounds)
      Similarity.ivfPqTopK(corpus.filter(col("vec_id") =!= 0), "vec_id",
          "embedding", trained, qvec, m = PqSubspaces, k = 5,
          nprobe = 2, shortlist = 20)
        .select(col("vec_id"), col("cos4"))
        .orderBy(col("cos4").desc, col("vec_id"))
    },

    // RANGE (radius) search — every vector with cos4 ≥ 0.2 of the
    // query, NOT top-k: the retrieval mode top-k ANN can't answer
    // (how many near-duplicates above a similarity bar? all docs in
    // a semantic neighborhood?). IVF cell pruning is useless here
    // (this corpus has no cluster structure — measured ~90° cell
    // radii), so the scale path is Similarity.sq8RangeSearch: a
    // codes-only at-rest scan (int8 + the STORED exact per-vector
    // angular distortion, ~¼ the bytes, vectors physically absent —
    // the v14 storage-enforcement doctrine) whose triangle-inequality
    // prefilter is provably sound, then an exact re-rank join that
    // touches full vectors only for the candidate fraction. The
    // oracle is the brute-force threshold scan — equality IS the
    // soundness check, on real data at every SF.
    // 1-bit BINARY quantization (operators/BinaryQuant): sign-bit codes
    // packed into 32-bit words — 64× smaller than float32 — hamming
    // (xor+popcount, no float math) prunes to 64 candidates, exact
    // cosine re-ranks. Fully deterministic both sides (exact sign
    // predicate, fixed packing, id tiebreaks), so the candidate set and
    // the top-5 hash-match the DuckDB bit-for-bit mirror. Top-64 by
    // (ham, id) is TakeOrdered — per-partition partial top-k, no global
    // sort.
    "v29_binary_quant" -> { (s, dir) =>
      import graft.functions.vectors
      import graft.operators.BinaryQuant
      val e = Tables(s, dir).embeddings
      val corpus = e.filter(col("vec_id") =!= 0)
      val qvec = e.filter(col("vec_id") === 0).select(col("embedding"))
        .collect()(0).getSeq[Float](0).map(_.toDouble).toArray
      val qcode = BinaryQuant.bqCodeLocal(qvec)
      corpus
        .withColumn("ham", BinaryQuant.hamming(
          BinaryQuant.bqCode(col("embedding"), dims = 64), lit(qcode)))
        .orderBy(col("ham"), col("vec_id")).limit(64)
        .withColumn("cos4", round(vectors.cosine(
          vectors.asDouble(col("embedding")), lit(qvec)), 4))
        .select(col("vec_id"), col("ham"), col("cos4"))
        .orderBy(col("cos4").desc, col("vec_id")).limit(5)
    },

    // INDEX LIFECYCLE, the delete leg (Similarity.deleteFromIvfIndex —
    // after build v11, append v27, compact v28): every 7th corpus vector
    // is tombstoned into a cell-partitioned sibling table (base files
    // NEVER rewritten, O(deleted) write), then the v11 probe runs with
    // the tombstones anti-joined in — both scans pruned to the probed
    // cells at planning time, the anti-join unhinted (AQE decides; the
    // q03 no-unbounded-hint invariant). The oracle is the v06/v11
    // multiprobe mirror minus the deleted ids: hash equality proves the
    // merge-on-read delete is indistinguishable from a rebuild without
    // those rows — s15's doctrine applied to a vector index.
    "v30_ivf_deletes" -> { (s, dir) =>
      import graft.functions.vectors
      val e = Tables(s, dir).embeddings
      val cb = codebook(e)
      val corpus = e.filter(col("vec_id") =!= 0)
      Similarity.writeIvfIndex(corpus, "embedding", cb,
        "graft_ivf_idx_del")
      Similarity.deleteFromIvfIndex(corpus.filter(col("vec_id") % 7 === 2),
        "vec_id", "embedding", cb, "graft_ivf_idx_del")
      val q = e.filter(col("vec_id") === 0)
      val cells = q.select(
          Similarity.ivfProbeCells(col("embedding"), cb, 2).as("c"))
        .collect()(0).getSeq[Int](0)
      val qb = broadcast(q.select(col("embedding").as("__qvec")))
      Similarity.readIvfIndexWithDeletes(s, "graft_ivf_idx_del",
          "vec_id", cells)
        .crossJoin(qb)
        .withColumn("cos4", round(vectors.cosine(
          vectors.asDouble(col("embedding")), vectors.asDouble(col("__qvec"))), 4))
        .select(col("vec_id"), col("cell"), col("cos4"))
        .orderBy(col("cos4").desc, col("vec_id"))
        .limit(5)
    },

    // INDEX LIFECYCLE, COMPOSED (VERDICT r12 #6): v27 append, v28
    // compact and v30 delete are each probe-invariance-checked in
    // isolation; a production index lives through INTERLEAVED
    // maintenance. One query drives the full sequence —
    //   build(corpus % 5 ≠ 3) → append(% 5 = 3)
    //   → delete(% 7 = 2)                       [tombstones at hwm 1]
    //   → append(% 21 = 9)                      [re-inserts deleted ids]
    //   → delete(% 21 = 9 AND % 2 = 1)          [re-deletes SOME of them]
    //   → compact hot cells → probe
    // — and hashes against the from-scratch multiprobe mirror over the
    // surviving id set. The __seq axis is what makes this composable:
    // each tombstone kills exactly the physical rows that existed when
    // its delete ran (base + first-append copies at hwm 1; the
    // re-inserted copies too at hwm 2), never a later re-append, and
    // compaction's in-place rewrite preserves __seq so the merged read
    // is invariant across it (IvfDeleteSpec pins that edge directly).
    "v31_ivf_lifecycle" -> { (s, dir) =>
      import graft.functions.vectors
      val e = Tables(s, dir).embeddings
      val cb = codebook(e)
      val corpus = e.filter(col("vec_id") =!= 0)
      val t = "graft_ivf_idx_life"
      Similarity.writeIvfIndex(corpus.filter(col("vec_id") % 5 =!= 3),
        "embedding", cb, t)
      Similarity.appendIvfIndex(corpus.filter(col("vec_id") % 5 === 3),
        "embedding", cb, t)
      Similarity.deleteFromIvfIndex(corpus.filter(col("vec_id") % 7 === 2),
        "vec_id", "embedding", cb, t)
      Similarity.appendIvfIndex(corpus.filter(col("vec_id") % 21 === 9),
        "embedding", cb, t)
      Similarity.deleteFromIvfIndex(
        corpus.filter(col("vec_id") % 21 === 9 && col("vec_id") % 2 === 1),
        "vec_id", "embedding", cb, t)
      graft.sources.Compaction.compactHotPartitions(s, t, "cell",
        targetRows = 8L * 1024 * 1024)
      val q = e.filter(col("vec_id") === 0)
      val cells = q.select(
          Similarity.ivfProbeCells(col("embedding"), cb, 2).as("c"))
        .collect()(0).getSeq[Int](0)
      val qb = broadcast(q.select(col("embedding").as("__qvec")))
      Similarity.readIvfIndexWithDeletes(s, t, "vec_id", cells)
        .crossJoin(qb)
        .withColumn("cos4", round(vectors.cosine(
          vectors.asDouble(col("embedding")), vectors.asDouble(col("__qvec"))), 4))
        .select(col("vec_id"), col("cell"), col("cos4"))
        .orderBy(col("cos4").desc, col("vec_id"))
        .limit(5)
    },

    "v26_range_search" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val scale = Similarity.sq8MaxAbs(e, "embedding")
      val qvec = e.filter(col("vec_id") === 0).select(col("embedding"))
        .collect()(0).getSeq[Float](0).map(_.toDouble).toArray
      graft.sources.Warehouse.writeTable(
        Similarity.sq8RangeEncode(
          Tables(s, dir).embeddingsKernelParallel
            .filter(col("vec_id") =!= 0),
          "vec_id", "embedding", scale),
        "graft_sq8_range")
      Similarity.sq8RangeSearch(e.filter(col("vec_id") =!= 0),
          graft.sources.Warehouse.read(s, "graft_sq8_range"),
          "vec_id", "embedding", qvec, scale, tau = 0.2)
        .orderBy(col("cos4").desc, col("vec_id"))
    }
  )

  /** Codebook size for v04/v05 (centroids = vec_id 1..CodebookSize). */
  val CodebookSize: Int = 8

  /** Lloyd training rounds for v23 (fixed — oracle-unrolled). */
  val KmeansTrainRounds: Int = 2

  /** v17's recall query panel — held out of the corpus on both sides. */
  val RecallQueryIds: Seq[Long] = Seq(0L, 9L, 10L, 11L, 12L)

  /** PQ subspace count for v07 (64-dim vectors → 16-dim subvectors). */
  val PqSubspaces: Int = 4

  /** Deterministic codebook: the embeddings of vec_id 1..CodebookSize
    * (a bounded driver-held constant, like any IVF codebook).
    */
  private[queries] def codebook(e: DataFrame): Seq[(Int, Array[Double])] =
    e.filter(col("vec_id").between(1, CodebookSize))
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0).toInt ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
      .toSeq

  /** SQL mirror of Similarity.signBucket over BucketPositions. */
  /** Shared mirror for v08/v12 (fused ADC scan vs codes table at rest —
    * the detour through storage must not change the ranking).
    */
  private lazy val pqAdcSql: String = {
    val sub = 64 / PqSubspaces
    def qd(vec: String) =
      s"(CAST(round(($vec[(j.j-1)*$sub + i] - c.ce[(j.j-1)*$sub + i]) * 1000000) AS BIGINT))"
    val ed = qd("e.ee")
    val ld = qd("q.qe")
    val codeCols = (1 to PqSubspaces).map(j =>
      s"CAST(MAX(CASE WHEN a.j = $j THEN a.cid END) AS INT) AS c$j").mkString(",\n ")
    s"""WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
       |           FROM embeddings WHERE vec_id BETWEEN 1 AND $CodebookSize),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS ee
       |      FROM embeddings WHERE vec_id <> 0),
       |q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
       |j AS (SELECT unnest(generate_series(1, $PqSubspaces)) AS j),
       |d AS (SELECT e.vec_id, j.j, c.cid,
       |       CAST(list_sum([$ed * $ed
       |        FOR i IN generate_series(1, $sub)]) AS BIGINT) AS d
       |      FROM e CROSS JOIN c CROSS JOIN j),
       |a AS (SELECT vec_id, j, cid,
       |       row_number() OVER (PARTITION BY vec_id, j ORDER BY d, cid) AS rn
       |      FROM d),
       |lut AS (SELECT j.j, c.cid,
       |        CAST(list_sum([$ld * $ld
       |         FOR i IN generate_series(1, $sub)]) AS BIGINT) AS ld
       |        FROM c CROSS JOIN j CROSS JOIN q)
       |SELECT a.vec_id,
       | $codeCols,
       | CAST(SUM(l.ld) AS BIGINT) AS adc
       |FROM a JOIN lut l ON a.j = l.j AND a.cid = l.cid
       |WHERE a.rn = 1 GROUP BY a.vec_id
       |ORDER BY adc, vec_id LIMIT 10""".stripMargin
  }

  /** Shared mirror for v13/v14 (fused SQ8 scan vs codes table at rest). */
  private lazy val sq8TopKSql: String =
    s"""WITH s AS (SELECT MAX(list_max([abs(x) FOR x IN embedding::DOUBLE[]])) AS s
       |           FROM embeddings),
       |q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS ee
       |      FROM embeddings WHERE vec_id <> 0)
       |SELECT e.vec_id,
       | CAST(list_sum([CAST(round(e.ee[i] * 127 / s.s) AS BIGINT)
       |                * CAST(round(q.qe[i] * 127 / s.s) AS BIGINT)
       |                FOR i IN generate_series(1, 64)]) AS BIGINT) AS score
       |FROM e, q, s ORDER BY score DESC, vec_id LIMIT 10""".stripMargin

  /** Shared mirror for v06/v11 (one semantics, two storage paths). */
  private lazy val ivfMultiprobeSql: String = ivfMultiprobeSqlWhere("")

  /** [[ivfMultiprobeSql]] with an extra corpus predicate (ANDed into the
    * scored scan) — the v30 delete mirror excludes the tombstoned ids.
    */
  private def ivfMultiprobeSqlWhere(extra: String): String =
    s"""WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
       |           FROM embeddings WHERE vec_id BETWEEN 1 AND $CodebookSize),
       |q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
       |qcells AS (SELECT cid AS qc FROM c, q
       |           ORDER BY round(${cosineSql("qe", "ce")}, 4) DESC, cid LIMIT 2),
       |scored AS (
       | SELECT e.vec_id, e.embedding::DOUBLE[] AS ee, c.cid,
       |  row_number() OVER (PARTITION BY e.vec_id
       |   ORDER BY round(${cosineSql("e.embedding::DOUBLE[]", "c.ce")}, 4) DESC,
       |            c.cid) AS rn
       | FROM embeddings e CROSS JOIN c
       | WHERE e.vec_id <> 0$extra),
       |a AS (SELECT vec_id, ee, CAST(cid AS INT) AS cell
       |      FROM scored WHERE rn = 1)
       |SELECT a.vec_id, a.cell, round(${cosineSql("a.ee", "q.qe")}, 4) AS cos4
       |FROM a, q WHERE a.cell IN (SELECT qc FROM qcells)
       |ORDER BY cos4 DESC, vec_id LIMIT 5""".stripMargin

  private val bucketSql: String =
    BucketPositions.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN embedding[$p] > 0 THEN ${1 << (BucketPositions.size - 1 - i)} ELSE 0 END)"
    }.mkString(" + ")

  /** One full-Lloyd assignment+means round as DuckDB CTEs (cell, ce
    * evolve as c$i) — shared by the v23 oracle (which checks the
    * round-(k+1) stats) and the v25 oracle (which feeds the trained c$k
    * into the v09 search chain).
    */
  private def lloydRoundCtes(i: Int): String =
    s"""s$i AS (
       | SELECT e.vec_id, e.embedding::DOUBLE[] AS ee, c.cell,
       |  row_number() OVER (PARTITION BY e.vec_id
       |   ORDER BY round(${cosineSql("e.embedding::DOUBLE[]", "c.ce")}, 4) DESC,
       |            c.cell) AS rn
       | FROM embeddings e CROSS JOIN c${i - 1} c),
       |a$i AS (SELECT vec_id, ee, cell FROM s$i WHERE rn = 1),
       |x$i AS (SELECT cell,
       |       unnest([{'i': i, 'x': ee[i]}
       |               FOR i IN range(1, len(ee)+1)], recursive := true)
       |      FROM a$i),
       |m$i AS (SELECT cell, CAST(i AS INT) AS idx, COUNT(*) AS n_members,
       |       CAST(SUM(CAST(round(x*1000000) AS BIGINT)) AS DOUBLE)
       |         / (COUNT(*) * 1000000.0) AS mean_val
       |      FROM x$i GROUP BY cell, i)""".stripMargin

  private def lloydUpdateCtes(i: Int): String =
    s"""n$i AS (SELECT cell, list(mean_val ORDER BY idx) AS ce
       |        FROM m$i GROUP BY cell),
       |c$i AS (SELECT p.cell, COALESCE(n$i.ce, p.ce) AS ce
       |        FROM c${i - 1} p LEFT JOIN n$i USING (cell))""".stripMargin

  /** Rounds 1..KmeansTrainRounds chained (c0 → c$KmeansTrainRounds). */
  private def lloydTrainChain: String = (1 to KmeansTrainRounds)
    .map(i => lloydRoundCtes(i) + ",\n" + lloydUpdateCtes(i)).mkString(",\n")

  def oracle: Map[String, String] = Map(
    "v01_knn_bruteforce" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, label,
         | round(${cosineSql("embedding::DOUBLE[]", "qe::DOUBLE[]")}, 4) AS cos4
         |FROM embeddings, q WHERE vec_id <> 0
         |ORDER BY cos4 DESC, vec_id LIMIT 10""".stripMargin,

    "v02_ann_bucket_probe" ->
      s"""WITH q AS (
         | SELECT embedding AS qe, $bucketSql AS qbucket
         | FROM embeddings WHERE vec_id = 0),
         |b AS (
         | SELECT vec_id, embedding, $bucketSql AS bucket
         | FROM embeddings WHERE vec_id <> 0)
         |SELECT vec_id, bucket,
         | round(${cosineSql("embedding::DOUBLE[]", "qe::DOUBLE[]")}, 4) AS cos4
         |FROM b, q WHERE bucket = qbucket
         |ORDER BY cos4 DESC, vec_id LIMIT 5""".stripMargin,

    "v03_bucket_histogram" ->
      s"""SELECT $bucketSql AS bucket, count(*) AS n
         |FROM embeddings GROUP BY 1 ORDER BY bucket""".stripMargin,

    "v06_ivf_multiprobe" -> ivfMultiprobeSql,

    // v11 is v06 through the partitioned index — same semantics, same
    // mirror. (The storage layout is Spark-side mechanics the oracle
    // can't see; what it CAN see is any row lost or cell corrupted by
    // the partitioned write, which would break the hash.)
    "v11_ivf_partitioned_probe" -> ivfMultiprobeSql,

    // v27 is v11 with the index built in two generations (base + append)
    // — same mirror again: the oracle can't see the file layout, but any
    // row lost/duplicated or cell mis-assigned by the append breaks the
    // hash
    "v27_ivf_append" -> ivfMultiprobeSql,

    // v28 is v27 plus an in-place hot-cell compaction before the probe —
    // same mirror once more: any row lost/duplicated or cell corrupted
    // by the rewrite breaks the hash
    "v28_ivf_compact" -> ivfMultiprobeSql,

    // the delete mirror: the same multiprobe over the corpus MINUS the
    // tombstoned ids — merge-on-read must equal rebuild-without-deleted
    "v30_ivf_deletes" -> ivfMultiprobeSqlWhere(" AND e.vec_id % 7 <> 2"),

    // the net survivor set of the composed lifecycle: everything except
    // the %7=2 deletions, with the %21=9 re-inserts back EXCEPT the odd
    // ones the second delete removed again
    "v31_ivf_lifecycle" -> ivfMultiprobeSqlWhere(
      " AND (e.vec_id % 7 <> 2 OR (e.vec_id % 21 = 9 AND e.vec_id % 2 = 0))"),

    // bit-for-bit mirror of BinaryQuant: identical 32-bit-word sign
    // packing (dim 1 = high bit of word 0), xor+bit_count hamming, same
    // (ham, id) candidate cut and (cos4 desc, id) final order
    "v29_binary_quant" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
         |           WHERE vec_id = 0),
         |c AS (SELECT vec_id, embedding::DOUBLE[] AS ee FROM embeddings
         |      WHERE vec_id <> 0),
         |qq AS (SELECT [CAST(list_sum([CASE WHEN qe[w*32+j] >= 0
         |                 THEN (CAST(1 AS BIGINT) << (32-j)) ELSE 0 END
         |                 FOR j IN range(1, 33)]) AS BIGINT)
         |               FOR w IN range(0, 2)] AS qcode FROM q),
         |cc AS (SELECT vec_id, ee,
         |         [CAST(list_sum([CASE WHEN ee[w*32+j] >= 0
         |            THEN (CAST(1 AS BIGINT) << (32-j)) ELSE 0 END
         |            FOR j IN range(1, 33)]) AS BIGINT)
         |          FOR w IN range(0, 2)] AS code FROM c),
         |cand AS (
         |  SELECT vec_id, ee,
         |    CAST(list_sum([bit_count(xor(code[w], qcode[w]))
         |                   FOR w IN range(1, 3)]) AS BIGINT) AS ham
         |  FROM cc CROSS JOIN qq
         |  ORDER BY ham, vec_id LIMIT 64)
         |SELECT vec_id, ham, round(${cosineSql("ee", "qe")}, 4) AS cos4
         |FROM cand CROSS JOIN q
         |ORDER BY cos4 DESC, vec_id LIMIT 5""".stripMargin,

    // Mirrors kmeansStep: same cell assignment as v04, then per-cell
    // quantized component means (1e-6 integer sums → one exact division).
    "v05_kmeans_step" ->
      s"""WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
         |           FROM embeddings WHERE vec_id BETWEEN 1 AND $CodebookSize),
         |scored AS (
         | SELECT e.vec_id, e.embedding::DOUBLE[] AS ee, c.cid,
         |  row_number() OVER (PARTITION BY e.vec_id
         |   ORDER BY round(${cosineSql("e.embedding::DOUBLE[]", "c.ce")}, 4) DESC,
         |            c.cid) AS rn
         | FROM embeddings e CROSS JOIN c),
         |a AS (SELECT vec_id, ee, CAST(cid AS INT) AS cell
         |      FROM scored WHERE rn = 1),
         |x AS (SELECT cell,
         |       unnest([{'i': i, 'x': ee[i]}
         |               FOR i IN range(1, len(ee)+1)], recursive := true)
         |      FROM a)
         |SELECT cell, CAST(i AS INT) AS idx, COUNT(*) AS n_members,
         | CAST(SUM(CAST(round(x*1000000) AS BIGINT)) AS DOUBLE)
         |   / (COUNT(*) * 1000000.0) AS mean_val
         |FROM x GROUP BY cell, i ORDER BY cell, idx""".stripMargin,

    // Every Lloyd round unrolled: round i assigns with centroid table
    // c(i-1) (same rounded-cosine argmax as v05), recomputes quantized
    // means, and rebuilds c(i) with the empty-cell COALESCE; the final
    // pass emits the round-(rounds+1) assignment stats.
    "v23_kmeans_train" -> {
      def roundCtes(i: Int): String = lloydRoundCtes(i)
      def updateCtes(i: Int): String = lloydUpdateCtes(i)
      val trainRounds = lloydTrainChain
      val last = KmeansTrainRounds + 1
      s"""WITH c0 AS (SELECT CAST(vec_id AS INT) AS cell,
         |              embedding::DOUBLE[] AS ce
         |            FROM embeddings WHERE vec_id BETWEEN 1 AND $CodebookSize),
         |$trainRounds,
         |${roundCtes(last)}
         |SELECT cell, idx, n_members, mean_val
         |FROM m$last ORDER BY cell, idx""".stripMargin
    },

    "v24_pq_train" -> {
      val sub = 64 / PqSubspaces
      // exact-integer L2 of subvector j against sub-codeword ce (length
      // sub) — the same 1e-6 delta quantization as v07, but ce is the
      // EVOLVING per-subspace codeword, not a fixed full-dim slice
      def qd = s"(CAST(round((e.ee[(c.j-1)*$sub + i] - c.ce[i]) * 1000000) AS BIGINT))"
      def roundCtes(i: Int): String =
        s"""d$i AS (SELECT e.vec_id, c.j, c.cid,
           |        CAST(list_sum([$qd * $qd
           |         FOR i IN generate_series(1, $sub)]) AS BIGINT) AS d
           |       FROM e CROSS JOIN c${i - 1} c),
           |a$i AS (SELECT vec_id, j, cid,
           |        row_number() OVER (PARTITION BY vec_id, j
           |                           ORDER BY d, cid) AS rn
           |       FROM d$i),
           |x$i AS (SELECT a.j, a.cid AS cell,
           |        unnest([{'i': i, 'x': e.ee[(a.j-1)*$sub + i]}
           |                FOR i IN range(1, $sub + 1)], recursive := true)
           |       FROM a$i a JOIN e USING (vec_id) WHERE a.rn = 1),
           |m$i AS (SELECT j, cell, CAST(i AS INT) AS idx,
           |        COUNT(*) AS n_members,
           |        CAST(SUM(CAST(round(x*1000000) AS BIGINT)) AS DOUBLE)
           |          / (COUNT(*) * 1000000.0) AS mean_val
           |       FROM x$i GROUP BY j, cell, i)""".stripMargin
      def updateCtes(i: Int): String =
        s"""n$i AS (SELECT j, cell, list(mean_val ORDER BY idx) AS ce
           |        FROM m$i GROUP BY j, cell),
           |c$i AS (SELECT p.j, p.cid, COALESCE(n.ce, p.ce) AS ce
           |        FROM c${i - 1} p LEFT JOIN n$i n
           |          ON n.j = p.j AND n.cell = p.cid)""".stripMargin
      val trainRounds = (1 to KmeansTrainRounds)
        .map(i => roundCtes(i) + ",\n" + updateCtes(i)).mkString(",\n")
      val last = KmeansTrainRounds + 1
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ee
         |           FROM embeddings),
         |jj AS (SELECT unnest(generate_series(1, $PqSubspaces)) AS j),
         |c0 AS (SELECT jj.j, CAST(e.vec_id AS INT) AS cid,
         |        [e.ee[(jj.j-1)*$sub + i] FOR i IN range(1, $sub + 1)] AS ce
         |       FROM e CROSS JOIN jj
         |       WHERE e.vec_id BETWEEN 1 AND $CodebookSize),
         |$trainRounds,
         |${roundCtes(last)}
         |SELECT j, cell, idx, n_members, mean_val
         |FROM m$last ORDER BY j, cell, idx""".stripMargin
    },

    // v23's train chain (c0 → c$K) then v09's ENTIRE search chain with
    // the trained centroids as the codebook — training and search
    // replayed in one statement
    "v25_trained_ivf_pq" -> {
      val k = KmeansTrainRounds
      val sub = 64 / PqSubspaces
      def qd(vec: String) =
        s"(CAST(round(($vec[(j.j-1)*$sub + i] - c.ce[(j.j-1)*$sub + i]) * 1000000) AS BIGINT))"
      val ed = qd("p.ee")
      val ld = qd("q.qe")
      s"""WITH c0 AS (SELECT CAST(vec_id AS INT) AS cell,
         |              embedding::DOUBLE[] AS ce
         |            FROM embeddings WHERE vec_id BETWEEN 1 AND $CodebookSize),
         |$lloydTrainChain,
         |c AS (SELECT cell AS cid, ce FROM c$k),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS ee
         |      FROM embeddings WHERE vec_id <> 0),
         |q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
         |qcells AS (SELECT cid AS qc FROM c, q
         |           ORDER BY round(${cosineSql("qe", "ce")}, 4) DESC, cid LIMIT 2),
         |scored AS (
         | SELECT e.vec_id, e.ee, c.cid,
         |  row_number() OVER (PARTITION BY e.vec_id
         |   ORDER BY round(${cosineSql("e.ee", "c.ce")}, 4) DESC, c.cid) AS rn
         | FROM e CROSS JOIN c),
         |p AS (SELECT vec_id, ee FROM scored
         |      WHERE rn = 1 AND CAST(cid AS INT) IN (SELECT qc FROM qcells)),
         |j AS (SELECT unnest(generate_series(1, $PqSubspaces)) AS j),
         |d AS (SELECT p.vec_id, j.j, c.cid,
         |       CAST(list_sum([$ed * $ed
         |        FOR i IN generate_series(1, $sub)]) AS BIGINT) AS d
         |      FROM p CROSS JOIN c CROSS JOIN j),
         |asn AS (SELECT vec_id, j, cid,
         |       row_number() OVER (PARTITION BY vec_id, j ORDER BY d, cid) AS rn
         |      FROM d),
         |lut AS (SELECT j.j, c.cid,
         |        CAST(list_sum([$ld * $ld
         |         FOR i IN generate_series(1, $sub)]) AS BIGINT) AS ld
         |        FROM c CROSS JOIN j CROSS JOIN q),
         |adc AS (SELECT asn.vec_id, CAST(SUM(l.ld) AS BIGINT) AS adc
         |        FROM asn JOIN lut l ON asn.j = l.j AND asn.cid = l.cid
         |        WHERE asn.rn = 1 GROUP BY asn.vec_id),
         |short AS (SELECT vec_id FROM adc ORDER BY adc, vec_id LIMIT 20)
         |SELECT e.vec_id, round(${cosineSql("e.ee", "q.qe")}, 4) AS cos4
         |FROM e JOIN short USING (vec_id), q
         |ORDER BY cos4 DESC, e.vec_id LIMIT 5""".stripMargin
    },

    // brute-force threshold scan — equality with the engine's
    // prefilter+re-rank result IS the prefilter's soundness proof
    "v26_range_search" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id,
         | round(${cosineSql("embedding::DOUBLE[]", "qe::DOUBLE[]")}, 4) AS cos4
         |FROM embeddings, q WHERE vec_id <> 0
         |  AND round(${cosineSql("embedding::DOUBLE[]", "qe::DOUBLE[]")}, 4)
         |      >= 0.2
         |ORDER BY cos4 DESC, vec_id""".stripMargin,

    "v07_pq_codes" -> {
      val sub = 64 / PqSubspaces
      def delta = s"(e.ee[(j.j-1)*$sub + i] - c.ce[(j.j-1)*$sub + i])"
      def qd = s"(CAST(round($delta * 1000000) AS BIGINT))"
      val codeCols = (1 to PqSubspaces).map(j =>
        s"CAST(MAX(CASE WHEN j = $j THEN cid END) AS INT) AS c$j").mkString(",\n ")
      s"""WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
         |           FROM embeddings WHERE vec_id BETWEEN 1 AND $CodebookSize),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS ee
         |      FROM embeddings WHERE vec_id <> 0),
         |j AS (SELECT unnest(generate_series(1, $PqSubspaces)) AS j),
         |d AS (SELECT e.vec_id, j.j, c.cid,
         |       CAST(list_sum([$qd * $qd
         |        FOR i IN generate_series(1, $sub)]) AS BIGINT) AS d
         |      FROM e CROSS JOIN c CROSS JOIN j),
         |a AS (SELECT vec_id, j, cid,
         |       row_number() OVER (PARTITION BY vec_id, j ORDER BY d, cid) AS rn
         |      FROM d)
         |SELECT vec_id,
         | $codeCols
         |FROM a WHERE rn = 1 GROUP BY vec_id ORDER BY vec_id""".stripMargin
    },

    // shared with v12: the codes-at-rest detour must produce the exact
    // ranking the fused scan does
    "v08_pq_adc_topk" -> pqAdcSql,

    "v12_pq_codes_at_rest" -> pqAdcSql,

    // Mirrors ivfPqTopK end-to-end: v04's cell assignment + v06's 2-cell
    // probe + v08's exact-integer codes/LUT (restricted to the probed
    // cells) + cosine re-rank of the 20-row shortlist.
    "v09_ivf_pq_rerank" -> {
      val sub = 64 / PqSubspaces
      def qd(vec: String) =
        s"(CAST(round(($vec[(j.j-1)*$sub + i] - c.ce[(j.j-1)*$sub + i]) * 1000000) AS BIGINT))"
      val ed = qd("p.ee")
      val ld = qd("q.qe")
      s"""WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
         |           FROM embeddings WHERE vec_id BETWEEN 1 AND $CodebookSize),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS ee
         |      FROM embeddings WHERE vec_id <> 0),
         |q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
         |qcells AS (SELECT cid AS qc FROM c, q
         |           ORDER BY round(${cosineSql("qe", "ce")}, 4) DESC, cid LIMIT 2),
         |scored AS (
         | SELECT e.vec_id, e.ee, c.cid,
         |  row_number() OVER (PARTITION BY e.vec_id
         |   ORDER BY round(${cosineSql("e.ee", "c.ce")}, 4) DESC, c.cid) AS rn
         | FROM e CROSS JOIN c),
         |p AS (SELECT vec_id, ee FROM scored
         |      WHERE rn = 1 AND CAST(cid AS INT) IN (SELECT qc FROM qcells)),
         |j AS (SELECT unnest(generate_series(1, $PqSubspaces)) AS j),
         |d AS (SELECT p.vec_id, j.j, c.cid,
         |       CAST(list_sum([$ed * $ed
         |        FOR i IN generate_series(1, $sub)]) AS BIGINT) AS d
         |      FROM p CROSS JOIN c CROSS JOIN j),
         |a AS (SELECT vec_id, j, cid,
         |       row_number() OVER (PARTITION BY vec_id, j ORDER BY d, cid) AS rn
         |      FROM d),
         |lut AS (SELECT j.j, c.cid,
         |        CAST(list_sum([$ld * $ld
         |         FOR i IN generate_series(1, $sub)]) AS BIGINT) AS ld
         |        FROM c CROSS JOIN j CROSS JOIN q),
         |adc AS (SELECT a.vec_id, CAST(SUM(l.ld) AS BIGINT) AS adc
         |        FROM a JOIN lut l ON a.j = l.j AND a.cid = l.cid
         |        WHERE a.rn = 1 GROUP BY a.vec_id),
         |short AS (SELECT vec_id FROM adc ORDER BY adc, vec_id LIMIT 20)
         |SELECT e.vec_id, round(${cosineSql("e.ee", "q.qe")}, 4) AS cos4
         |FROM e JOIN short USING (vec_id), q
         |ORDER BY cos4 DESC, e.vec_id LIMIT 5""".stripMargin
    },

    // v04's cell-assignment chain + a per-cell capped row_number in the
    // same (md5 bucket, id) order as Splits.pctBucket
    "v10_diversity_cap" ->
      s"""WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
         |           FROM embeddings WHERE vec_id BETWEEN 1 AND $CodebookSize),
         |scored AS (
         | SELECT e.vec_id, c.cid,
         |  row_number() OVER (PARTITION BY e.vec_id
         |   ORDER BY round(${cosineSql("e.embedding::DOUBLE[]", "c.ce")}, 4) DESC,
         |            c.cid) AS rn
         | FROM embeddings e CROSS JOIN c
         | WHERE e.vec_id <> 0),
         |a AS (SELECT vec_id, CAST(cid AS INT) AS cell
         |      FROM scored WHERE rn = 1),
         |k AS (SELECT vec_id, cell,
         |       row_number() OVER (PARTITION BY cell
         |        ORDER BY ${saltedHash32Sql("CAST(vec_id AS VARCHAR)", 9)} % 100,
         |                 vec_id) AS rn
         |      FROM a)
         |SELECT vec_id, cell, CAST(rn AS INT) AS rn
         |FROM k WHERE rn <= 40 ORDER BY vec_id""".stripMargin,

    // Mirrors sq8TopK: same scale (corpus max |x|, query row included),
    // same left-to-right x*127/s arithmetic, and DuckDB's round IS the
    // kernel's half-away-from-zero on the binary double — exact match,
    // not the measure-zero-caveat kind. Shared with v14: the codes-at-
    // rest detour must produce the exact ranking the fused scan does.
    "v13_sq8_topk" -> sq8TopKSql,

    "v14_sq8_codes_at_rest" -> sq8TopKSql,

    // sign matrix regenerated from the md5 formula (first hex digit of
    // "i:j" even → +1); components µ-quantized to integers BEFORE the
    // sum, so both engines compute the same order-free integer —
    // embedding cast to DOUBLE[] first (float×int arithmetic would
    // diverge from Spark's double math). Shortlist of 100 by (pscore,
    // vec_id) — a total order, so the LIMIT is deterministic — then
    // the exact-cosine re-rank mirrors the engine's composition.
    "v15_random_projection" ->
      s"""WITH jdx AS (SELECT unnest(generate_series(1, 64)) AS j),
         |idx AS (SELECT unnest(generate_series(1, 16)) AS i),
         |sgn AS (SELECT i, j,
         |          CASE WHEN ('0x' || substr(md5(i || ':' || j), 1, 1))::INT
         |                    % 2 = 0
         |               THEN 1 ELSE -1 END AS s
         |        FROM idx, jdx),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |comp AS (SELECT e.vec_id, j.j,
         |           CAST(round(e.v[j.j] * 1000000) AS BIGINT) AS q
         |         FROM e, jdx j),
         |proj AS (SELECT c.vec_id, s.i, CAST(SUM(s.s * c.q) AS BIGINT) AS p
         |         FROM comp c JOIN sgn s ON s.j = c.j
         |         GROUP BY c.vec_id, s.i),
         |qp AS (SELECT i, p FROM proj WHERE vec_id = 0),
         |sc AS (SELECT pr.vec_id, CAST(SUM(pr.p * qp.p) AS BIGINT) AS pscore
         |       FROM proj pr JOIN qp ON qp.i = pr.i
         |       WHERE pr.vec_id <> 0
         |       GROUP BY pr.vec_id),
         |short AS (SELECT vec_id, pscore FROM sc
         |          ORDER BY pscore DESC, vec_id LIMIT 100),
         |q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
         |      WHERE vec_id = 0)
         |SELECT s.vec_id, s.pscore,
         | round(${cosineSql("e.v", "q.qe")}, 4) AS cos4
         |FROM short s JOIN e ON e.vec_id = s.vec_id, q
         |ORDER BY cos4 DESC, s.vec_id LIMIT 10""".stripMargin,

    // the greedy walk replayed exactly: integer rel/sim at 1e-4
    // granularity, per-step argmax = correlated ORDER BY ... LIMIT 1
    // subqueries in the recursive term (score 7·rel − 3·max sim to the
    // selected set, id tiebreak)
    "v16_mmr_rerank" -> {
      val pick =
        """SELECT c.vec_id FROM cand c
          |       WHERE NOT list_contains(w.sel, c.vec_id)
          |       ORDER BY 7*c.rel - 3*(SELECT MAX(s.s) FROM sim s
          |                             WHERE s.a = c.vec_id
          |                               AND list_contains(w.sel, s.b)) DESC,
          |         c.vec_id
          |       LIMIT 1""".stripMargin
      s"""WITH RECURSIVE qv AS (SELECT embedding::DOUBLE[] AS qe
         |  FROM embeddings WHERE vec_id = 0),
         |cand AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v,
         |    CAST(round(round(${cosineSql("embedding::DOUBLE[]", "qe")}, 4)
         |         * 10000) AS INT) AS rel
         |  FROM embeddings, qv WHERE vec_id <> 0
         |  ORDER BY rel DESC, vec_id LIMIT 25),
         |sim AS (
         |  SELECT a.vec_id AS a, b.vec_id AS b,
         |    CAST(round(round(${cosineSql("a.v", "b.v")}, 4) * 10000) AS INT)
         |      AS s
         |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
         |walk(step, sel, picked, rel) AS (
         |  (SELECT 1, [c.vec_id], c.vec_id, c.rel FROM cand c
         |   ORDER BY c.rel DESC, c.vec_id LIMIT 1)
         |  UNION ALL
         |  SELECT w.step + 1,
         |    list_append(w.sel, ($pick)),
         |    ($pick),
         |    (SELECT c.rel FROM cand c
         |       WHERE NOT list_contains(w.sel, c.vec_id)
         |       ORDER BY 7*c.rel - 3*(SELECT MAX(s.s) FROM sim s
         |                             WHERE s.a = c.vec_id
         |                               AND list_contains(w.sel, s.b)) DESC,
         |         c.vec_id
         |       LIMIT 1)
         |  FROM walk w WHERE w.step < 10)
         |SELECT step AS rank, picked AS vec_id,
         | CAST(rel AS DOUBLE)/10000 AS cos4
         |FROM walk ORDER BY rank""".stripMargin
    },

    "v18_matryoshka_recall" -> {
      val ids = RecallQueryIds.mkString(", ")
      s"""WITH qs AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
         |       FROM embeddings WHERE vec_id IN ($ids)),
         |corpus AS (SELECT vec_id, embedding::DOUBLE[] AS ee
         |           FROM embeddings WHERE vec_id NOT IN ($ids)),
         |scored AS (
         | SELECT qs.qid, corpus.vec_id,
         |  round(${cosineSql("corpus.ee", "qs.qe")}, 4) AS cos4,
         |  round(${cosineSql("(corpus.ee)[1:16]", "(qs.qe)[1:16]")}, 4)
         |    AS tcos4
         | FROM corpus CROSS JOIN qs),
         |r AS (SELECT qid, vec_id,
         |  row_number() OVER (PARTITION BY qid
         |    ORDER BY cos4 DESC, vec_id) AS rkf,
         |  row_number() OVER (PARTITION BY qid
         |    ORDER BY tcos4 DESC, vec_id) AS rkt
         | FROM scored)
         |SELECT qid, CAST(SUM(CASE WHEN rkf <= 10 AND rkt <= 10
         |                    THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
         | CAST(SUM(CASE WHEN rkf <= 10 AND rkt <= 10
         |           THEN 1 ELSE 0 END) * 1000 AS BIGINT) AS recall_bp
         |FROM r GROUP BY qid ORDER BY qid""".stripMargin
    },

    "v17_ann_recall" -> {
      val ids = RecallQueryIds.mkString(", ")
      s"""WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
         |           FROM embeddings WHERE vec_id BETWEEN 1 AND $CodebookSize),
         |qs AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
         |       FROM embeddings WHERE vec_id IN ($ids)),
         |corpus AS (SELECT vec_id, embedding::DOUBLE[] AS ee
         |           FROM embeddings WHERE vec_id NOT IN ($ids)),
         |cellr AS (
         | SELECT corpus.vec_id, corpus.ee, c.cid,
         |  row_number() OVER (PARTITION BY corpus.vec_id
         |   ORDER BY round(${cosineSql("corpus.ee", "c.ce")}, 4) DESC,
         |            c.cid) AS rn
         | FROM corpus CROSS JOIN c),
         |cc AS (SELECT vec_id, ee, cid AS cell FROM cellr WHERE rn = 1),
         |qcellr AS (
         | SELECT qs.qid, qs.qe, c.cid,
         |  row_number() OVER (PARTITION BY qs.qid
         |   ORDER BY round(${cosineSql("qs.qe", "c.ce")}, 4) DESC,
         |            c.cid) AS rn
         | FROM qs CROSS JOIN c),
         |qc AS (SELECT qid, qe, cid AS qcell FROM qcellr WHERE rn = 1),
         |scored AS (
         | SELECT qc.qid, cc.vec_id, cc.cell, qc.qcell,
         |  round(${cosineSql("cc.ee", "qc.qe")}, 4) AS cos4
         | FROM cc CROSS JOIN qc),
         |exact AS (SELECT qid, vec_id FROM (
         |   SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
         |     ORDER BY cos4 DESC, vec_id) AS rk FROM scored)
         |  WHERE rk <= 10),
         |probe AS (SELECT qid, vec_id FROM (
         |   SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
         |     ORDER BY cos4 DESC, vec_id) AS rk FROM scored
         |   WHERE cell = qcell)
         |  WHERE rk <= 10)
         |SELECT e.qid, CAST(COUNT(p.vec_id) AS BIGINT) AS n_hit,
         | CAST(COUNT(p.vec_id) * 1000 AS BIGINT) AS recall_bp
         |FROM exact e LEFT JOIN probe p
         |  ON e.qid = p.qid AND e.vec_id = p.vec_id
         |GROUP BY e.qid ORDER BY e.qid""".stripMargin
    },

    "v04_ivf_probe" ->
      s"""WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
         |           FROM embeddings WHERE vec_id BETWEEN 1 AND $CodebookSize),
         |q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
         |qcell AS (SELECT cid AS qc FROM c, q
         |          ORDER BY round(${cosineSql("qe", "ce")}, 4) DESC, cid LIMIT 1),
         |scored AS (
         | SELECT e.vec_id, e.embedding::DOUBLE[] AS ee, c.cid,
         |  row_number() OVER (PARTITION BY e.vec_id
         |   ORDER BY round(${cosineSql("e.embedding::DOUBLE[]", "c.ce")}, 4) DESC,
         |            c.cid) AS rn
         | FROM embeddings e CROSS JOIN c
         | WHERE e.vec_id <> 0),
         |a AS (SELECT vec_id, ee, CAST(cid AS INT) AS cell
         |      FROM scored WHERE rn = 1)
         |SELECT a.vec_id, a.cell, round(${cosineSql("a.ee", "q.qe")}, 4) AS cos4
         |FROM a, q, qcell WHERE a.cell = qcell.qc
         |ORDER BY cos4 DESC, vec_id LIMIT 5""".stripMargin,

    "v19_knn_vote_label" ->
      s"""WITH q AS (
         |  SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
         |  FROM embeddings WHERE vec_id % 50 = 0),
         |c AS (
         |  SELECT vec_id AS cid, label, embedding::DOUBLE[] AS cv
         |  FROM embeddings WHERE vec_id % 50 <> 0),
         |s AS (
         |  SELECT qid, cid, label,
         |    round(${cosineSql("cv", "qv")}, 4) AS cos4
         |  FROM c, q),
         |t AS (
         |  SELECT qid, cid, label, cos4,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY cos4 DESC, cid) AS rn
         |  FROM s),
         |v AS (
         |  SELECT qid, label, COUNT(*) AS n_votes, MAX(cos4) AS best_cos4
         |  FROM t WHERE rn <= 10 GROUP BY 1, 2),
         |w AS (
         |  SELECT qid, label, n_votes, best_cos4,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY n_votes DESC, label) AS vr
         |  FROM v)
         |SELECT qid, label, CAST(n_votes AS BIGINT) AS n_votes, best_cos4
         |FROM w WHERE vr = 1 ORDER BY qid""".stripMargin,

    "v22_quant_ablation" -> {
      val ids = RecallQueryIds.mkString(", ")
      s"""WITH s AS (
         |  SELECT MAX(list_max([abs(x) FOR x IN embedding::DOUBLE[]])) AS s
         |  FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
         |      FROM embeddings WHERE vec_id IN ($ids)),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS ev
         |      FROM embeddings WHERE vec_id NOT IN ($ids)),
         |sc AS (
         |  SELECT q.qid, e.vec_id,
         |    round(${cosineSql("e.ev", "q.qv")}, 4) AS cos4,
         |    CAST(list_sum([CAST(round(e.ev[i] * 127 / s.s) AS BIGINT)
         |                   * CAST(round(q.qv[i] * 127 / s.s) AS BIGINT)
         |                   FOR i IN generate_series(1, 64)]) AS BIGINT)
         |      AS qscore
         |  FROM e, q, s),
         |r AS (
         |  SELECT qid, vec_id,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY cos4 DESC, vec_id) AS rkf,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY qscore DESC, vec_id) AS rkq
         |  FROM sc)
         |SELECT qid,
         |  CAST(SUM(CASE WHEN rkf <= 10 AND rkq <= 10 THEN 1 ELSE 0 END)
         |       AS BIGINT) AS n_hit,
         |  CAST(SUM(CASE WHEN rkf <= 10 AND rkq <= 10 THEN 1 ELSE 0 END)
         |       * 1000 AS BIGINT) AS recall_bp
         |FROM r GROUP BY qid ORDER BY qid""".stripMargin
    },

    "v21_filtered_ann" ->
      s"""WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
         |           FROM embeddings WHERE vec_id BETWEEN 1 AND $CodebookSize),
         |q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
         |      WHERE vec_id = 0),
         |qcells AS (SELECT cid AS qc FROM c, q
         |           ORDER BY round(${cosineSql("qe", "ce")}, 4) DESC, cid
         |           LIMIT 2),
         |scored AS (
         | SELECT e.vec_id, e.label, e.embedding::DOUBLE[] AS ee, c.cid,
         |  row_number() OVER (PARTITION BY e.vec_id
         |   ORDER BY round(${cosineSql("e.embedding::DOUBLE[]", "c.ce")}, 4)
         |            DESC, c.cid) AS rn
         | FROM embeddings e CROSS JOIN c
         | WHERE e.vec_id <> 0 AND e.label = 3),
         |a AS (SELECT vec_id, label, ee, CAST(cid AS INT) AS cell
         |      FROM scored WHERE rn = 1)
         |SELECT a.vec_id, a.label, a.cell,
         | round(${cosineSql("a.ee", "q.qe")}, 4) AS cos4
         |FROM a, q WHERE a.cell IN (SELECT qc FROM qcells)
         |ORDER BY cos4 DESC, vec_id LIMIT 5""".stripMargin,

    "v20_ivf_batch_probe" ->
      s"""WITH c AS (
         |  SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
         |  FROM embeddings WHERE vec_id BETWEEN 1 AND $CodebookSize),
         |q0 AS (
         |  SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
         |  FROM embeddings WHERE vec_id % 50 = 0),
         |qc AS (
         |  SELECT qid, qv, CAST(cid AS INT) AS cell FROM (
         |    SELECT qid, qv, cid, row_number() OVER (PARTITION BY qid
         |      ORDER BY round(${cosineSql("qv", "ce")}, 4) DESC, cid) AS rn
         |    FROM q0 CROSS JOIN c)
         |  WHERE rn = 1),
         |a AS (
         |  SELECT vec_id, ee, CAST(cid AS INT) AS cell FROM (
         |    SELECT e.vec_id, e.embedding::DOUBLE[] AS ee, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY round(${cosineSql("e.embedding::DOUBLE[]", "c.ce")},
         |                       4) DESC, c.cid) AS rn
         |    FROM embeddings e CROSS JOIN c
         |    WHERE e.vec_id % 50 <> 0)
         |  WHERE rn = 1),
         |s AS (
         |  SELECT qc.qid, a.vec_id, a.cell,
         |    round(${cosineSql("a.ee", "qc.qv")}, 4) AS cos4
         |  FROM a JOIN qc USING (cell)),
         |r AS (
         |  SELECT qid, vec_id, cell, cos4,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY cos4 DESC, vec_id) AS rk
         |  FROM s)
         |SELECT qid, vec_id, cell, cos4, CAST(rk AS INT) AS rk
         |FROM r WHERE rk <= 5 ORDER BY qid, rk""".stripMargin
  )
}
