package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.text

/** Corpus-hygiene passes a training-data pipeline runs before training:
  * benchmark decontamination (drop documents that leak evaluation data)
  * and repetition filtering (drop documents dominated by repeated
  * n-grams — the MassiveText/Gopher quality signals). Both published,
  * standard techniques re-expressed as declarative Spark plans.
  */
object Contamination {

  /** Distinct word-n-gram set per row from the one-pass codegen kernel
    * (graft.plans.MinHashShingles) — no explode/window/shuffle before
    * the consumer needs one; rows whose text yields no n-gram produce an
    * empty array.
    */
  private def shingleSet(textCol: org.apache.spark.sql.Column, n: Int) =
    array_remove(coalesce(
      graft.plans.MinHashShingles
        .minhashShingles(text.normText(textCol), 1, n)
        .getField("sh"),
      array().cast("array<string>")), "")

  /** Benchmark decontamination: corpus documents sharing at least one
    * word n-gram with the benchmark (evaluation) set, with the count of
    * distinct leaked n-grams. Published practice uses n of 8–13 over
    * normalized words; n is the caller's contract with their eval suite.
    *
    * Scale shape: the benchmark side reduces to DISTINCT n-grams and is
    * broadcast — eval sets are tiny next to a training corpus, so the
    * corpus never shuffles at all: one kernel pass, a broadcast hash
    * probe, and the per-doc count aggregation shuffles only the (rare)
    * hits. If a benchmark ever outgrew the broadcast threshold, drop the
    * broadcast() hint and the same plan shuffle-joins on the gram.
    * Output: (idCol, n_hit_grams), contaminated docs only.
    */
  def contaminatedDocs(corpus: DataFrame, benchmark: DataFrame,
                       idCol: String, textCol: String, n: Int): DataFrame = {
    val bg = benchmark
      .select(explode(shingleSet(col(textCol), n)).as("s"))
      .distinct()
    corpus
      .select(col(idCol), explode(shingleSet(col(textCol), n)).as("s"))
      // the kernel emits DISTINCT shingles per doc, so this count is the
      // distinct leaked-gram count without a countDistinct's extra pass
      .join(broadcast(bg), Seq("s"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hit_grams"))
  }

  /** FUZZY benchmark decontamination: corpus documents whose word-n-gram
    * Jaccard similarity to SOME benchmark document clears
    * `thetaNum/thetaDen` — the near-duplicate complement to
    * [[contaminatedDocs]]' any-shared-gram test, for eval leaks that
    * were paraphrased/re-templated rather than copied verbatim
    * (published decontamination practice runs both: exact n-gram
    * overlap AND a fuzzy similarity pass). The threshold compares as
    * cross-multiplied integers, so the cut is exact — no float
    * boundary; the reported jaccard is rounded to 4 dp only for
    * cross-engine display parity.
    *
    * Scale shape: same asymmetry as [[contaminatedDocs]] — the
    * benchmark side (tiny: an eval suite) reduces to per-doc distinct
    * grams and BROADCASTS, so the corpus text never shuffles: ONE
    * kernel pass per side (set sizes are the kernel array's length,
    * carried through the explode — no size aggregate, no re-scan) and
    * a (corpus-doc, bench-doc)-keyed aggregate over only the matching
    * gram HITS — O(hits) rows, not O(corpus). Contrast with [[Dedup]]'s
    * corpus×corpus generators (banding/prefix filters): corpus×bench
    * needs neither because one side is broadcastable by assumption.
    * Output: (a = corpus id, b = bench id, jaccard 4dp), cleared pairs
    * only; a doc leaking several bench docs yields one row per pair.
    */
  def fuzzyContaminatedDocs(corpus: DataFrame, benchmark: DataFrame,
                            idCol: String, textCol: String, n: Int,
                            thetaNum: Int, thetaDen: Int): DataFrame = {
    require(thetaNum > 0 && thetaDen > 0 && thetaNum <= thetaDen,
      s"need 0 < thetaNum/thetaDen <= 1, got $thetaNum/$thetaDen")
    // the kernel emits DISTINCT shingles per doc → the set size is the
    // array length, carried through the explode so the kernel runs ONCE
    // per side and no size aggregate/join is needed
    val cg = corpus
      .select(col(idCol).as("a"), shingleSet(col(textCol), n).as("arr"))
      .select(col("a"), size(col("arr")).as("la"), explode(col("arr")).as("s"))
    val bg = benchmark
      .select(col(idCol).as("b"), shingleSet(col(textCol), n).as("arr"))
      .select(col("b"), size(col("arr")).as("lb"), explode(col("arr")).as("s"))
    cg.join(broadcast(bg), Seq("s"))
      .groupBy(col("a"), col("b"), col("la"), col("lb"))
      .agg(count(lit(1)).as("inter"))
      .filter(col("inter") * thetaDen >=
        (col("la") + col("lb") - col("inter")) * thetaNum)
      .select(col("a"), col("b"),
        round(col("inter").cast("double") /
          (col("la") + col("lb") - col("inter")), 4).as("jaccard"))
  }

  /** Cross-document repeated-span accounting — the C4 line-dedup analog
    * at word-n-gram granularity, with keep-first semantics: a gram
    * appearing in ≥ `minDf` documents is a SHARED SPAN; its keeper is
    * the smallest doc id containing it, and every other containing doc
    * counts it as a duplicated span (the text a span-scrub would cut
    * there). Completes the dedup family: exact (d01) → near (d02/d04)
    * → span-level. Output: (idCol, n_grams [distinct grams in the doc],
    * n_shared [shared spans this doc does not keep], dup_frac 4dp);
    * docs with fewer than n tokens yield no row.
    *
    * Scale shape: one kernel pass per doc (distinct grams stay with the
    * row), one gram-keyed aggregate whose map-side combine collapses
    * the repeats, and a gram-keyed join back. The shared-gram frame is
    * df-filtered; for stopword-grade `minDf` it broadcasts, and the
    * operator leaves that to AQE — at 100 TB with minDf=2 the frame is
    * corpus-sized and the join must shuffle, which is exactly how the
    * published C4 dedup ran.
    */
  def sharedSpanStats(docs: DataFrame, idCol: String, textCol: String,
                      n: Int, minDf: Long): DataFrame = {
    require(minDf >= 2, "minDf < 2 would mark every gram as shared")
    val grams = docs
      .select(col(idCol), explode(shingleSet(col(textCol), n)).as("s"))
    val shared = grams.groupBy(col("s"))
      .agg(count(lit(1)).as("df"), min(col(idCol)).as("keeper"))
      .filter(col("df") >= minDf)
    grams.join(shared.select(col("s"), col("keeper")), Seq("s"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("keeper").isNotNull && col("keeper") =!= col(idCol),
          1L).otherwise(0L)).as("n_shared"))
      .select(col(idCol), col("n_grams"), col("n_shared"),
        round(col("n_shared").cast("double") / col("n_grams"), 4)
          .as("dup_frac"))
  }

  /** Frequent-span SCRUB — the rewriting form of [[sharedSpanStats]]
    * (the "remove any substring occurring in ≥ minDf documents" pass of
    * exact-substring training-data dedup, Lee et al. 2022,
    * arXiv:2107.06499, realized over word n-grams): every token
    * position covered by AT LEAST ONE occurrence of a corpus-frequent
    * n-gram is deleted, and each document is reassembled from its
    * surviving tokens in order. Output: (id, scrubbed, n_kept) for
    * EVERY input document — a fully-boilerplate doc comes back with
    * scrubbed = '' and n_kept = 0, which is exactly the "drop it"
    * signal downstream hygiene uses.
    *
    * Scale shape: gram document-frequencies are one map-side-combined
    * aggregate on the gram key; the frequent set (df ≥ minDf) is a
    * vocabulary-scale frame that joins back against the gram stream on
    * the gram key (AQE broadcasts it when small — the common case: the
    * frequent tail of a corpus is tiny relative to the corpus). Covered
    * positions explode only FREQUENT occurrences (n rows each, not
    * every gram), dedup on (doc, pos), and the reassembly is one
    * aggregate on the doc key with an in-row sort — tokens of one doc
    * meet in one place, order restored by position, never by shuffle
    * arrival. Three keyed exchanges total (gram, doc·pos, doc), all
    * row-scale, none quadratic.
    */
  def scrubFrequentSpans(docs: DataFrame, idCol: String, textCol: String,
                         n: Int, minDf: Long): DataFrame = {
    require(minDf >= 2, "minDf < 2 would scrub every gram")
    val toks = docs
      .select(col(idCol), posexplode(text.tokens(col(textCol))))
      .toDF(idCol, "pos", "tok")
      .filter(col("tok") =!= "")
    val grams = docs
      .select(col(idCol), posexplode(text.shingles(col(textCol), n)))
      .toDF(idCol, "start", "g")
    val freq = grams.select(col(idCol), col("g")).distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select(col("g"))
    val covered = grams.join(freq, Seq("g"))
      .select(col(idCol),
        explode(sequence(col("start"), col("start") + (n - 1))).as("pos"))
      .distinct()
    val kept = toks.join(covered, Seq(idCol, "pos"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok"))).as("scrubbed"),
        count(lit(1)).as("n_kept"))
    docs.select(col(idCol)).join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("scrubbed"), lit("")).as("scrubbed"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Gopher-style repetition signals per document over word n-grams:
    * total grams, distinct grams, duplicate-gram ratio
    * (1 − distinct/total) and the share of the single most frequent gram
    * — the two thresholds the MassiveText filters cut on. One per-row
    * codegen pass (graft.plans.ShingleStats): occurrence counting happens
    * inside the row's own hash map, so nothing explodes and nothing
    * shuffles — the exploded long form pushed ~2M (doc, gram) rows
    * through a window + two aggregations for the same three numbers
    * (measured 0.95 s → ~0.3 s at sf0.1). Docs with fewer than n tokens
    * yield no row (kernel returns null), mirroring the long form.
    * Output: (idCol, n_grams, n_distinct, dup_ratio, top_share).
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
                      n: Int): DataFrame =
    docs
      .select(col(idCol), graft.plans.ShingleStats
        .shingleStats(text.normText(col(textCol)), n).as("__st"))
      .filter(col("__st").isNotNull)
      .select(col(idCol),
        col("__st.n_grams").as("n_grams"),
        col("__st.n_distinct").as("n_distinct"),
        round(lit(1.0) - col("__st.n_distinct").cast("double") / col("__st.n_grams"), 4)
          .as("dup_ratio"),
        round(col("__st.top_cnt").cast("double") / col("__st.n_grams"), 4)
          .as("top_share"))

  /** The exploded long form of [[repetitionStats]] — the independent
    * reference implementation the kernel is pinned against in
    * ContaminationSpec (same shape the DuckDB oracle uses).
    */
  private[graft] def repetitionStatsExploded(docs: DataFrame, idCol: String,
                                             textCol: String, n: Int): DataFrame = {
    val perGram = Dedup.shingleRows(docs, idCol, textCol, n)
      .groupBy(col(idCol), col("s"))
      .agg(count(lit(1)).as("c"))
    perGram.groupBy(col(idCol))
      .agg(sum(col("c")).as("n_grams"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_cnt"))
      .select(col(idCol), col("n_grams"), col("n_distinct"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_grams"), 4)
          .as("dup_ratio"),
        round(col("top_cnt").cast("double") / col("n_grams"), 4)
          .as("top_share"))
  }
}
