package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.text

/** Sparse-vector text similarity: TF-IDF-weighted cosine pairs over an
  * inverted-posting self-join — the WEIGHTED complement to the set-based
  * near-dup generators (d02 MinHash bands, d09 exact prefix-filtered
  * Jaccard): token frequency matters, so a doc that repeats a rare term
  * ranks closer than one that merely mentions it. This is the classic
  * similarity-join-by-index shape (Elsayed/Lin/Oard 2008 pairwise-
  * similarity MapReduce; Baraglia et al. document-similarity self-join):
  * postings banded by term, never corpus².
  *
  * Exactness doctrine: ALL weight arithmetic is integer (the d13/minhash
  * ids-only discipline applied to scoring). tf is impact-capped at 255
  * (uint8 impact quantization — standard IR posting compression), idf is
  * integer reciprocal-df `(100·N) div df` (idf ∝ N/df, centi-scaled; no
  * transcendentals, so Spark and a SQL oracle agree bit-for-bit), and
  * dot/norm accumulate in DECIMAL — exact in any engine, order-free.
  * The only floating point is the final `dot / (√n2a·√n2b)`: two square
  * roots and one division on exactly-agreed integers — IEEE-deterministic
  * cross-engine.
  *
  * Pruning doctrine (what makes it scale): the pair space is the PRUNED
  * vector space — terms with df > maxDf are dropped from postings AND
  * norms (the d14 winnowing maxDf boilerplate cut: on a templated corpus
  * the boilerplate terms carry no signal and all the join mass). Within
  * that space the cosine is exact: per-term join work is ≤ maxDf², so
  * total candidate volume is ≤ maxDf·Σdf — linear in corpus size with a
  * tunable constant, vs corpus² for the naive form. df=1 terms stay in
  * the norms (they are signal mass) but skip the join (no pair can
  * share them).
  */
object SparseSim {

  /** (a, b, cos) for every unordered doc pair whose pruned-space
    * TF-IDF cosine clears `minCosine = tauNum/tauDen`, a < b.
    *
    * `maxDfFrac`: relative df cut — terms in more than N/maxDfFrac docs
    * are boilerplate and leave the space (self-scaling with corpus
    * size). `maxDfCap`: absolute ceiling on posting length regardless of
    * corpus size — the 100 TB guard: per-term join work is bounded by
    * min(N/maxDfFrac, maxDfCap)² no matter how the corpus grows.
    *
    * Scale shape: one (doc, term) shuffle for tf with map-side combine;
    * one vocabulary-sized df aggregate (broadcast back under AQE); the
    * posting self-join is an equi-join on term over df-capped postings;
    * one (a, b) aggregate for dots. The corpus-scalar N rides a
    * broadcast literal frame (the t12 stats shape). No driver state.
    */
  def tfidfCosinePairs(docs: DataFrame, idCol: String, textCol: String,
                       tauNum: Int, tauDen: Int,
                       maxDfFrac: Int = 10,
                       maxDfCap: Long = 100000L): DataFrame = {
    require(tauDen > 0 && tauNum >= 0, "threshold must be >= 0")
    require(maxDfFrac >= 1, "maxDfFrac must be >= 1")
    require(maxDfCap >= 2, "maxDfCap must allow pairs (>= 2)")
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(text.tokens(col(textCol))).as("t"))
      .filter(col("t") =!= "")
      .groupBy(col("doc_id"), col("t"))
      .agg(least(count(lit(1)), lit(255L)).as("tf"))
    val dfreq = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    // corpus-count scalar as a broadcast frame: stays in the plan (no
    // driver round trip), lands on every executor once
    val nFrame = broadcast(docs.agg(count(lit(1)).as("n")))
    // integer centi-idf: floor((100·N)/df) — 100·N ≪ 2^53, so the
    // double division is exact and floor equals integer division
    val idf = floor(lit(100.0) * col("n") / col("df")).cast("long")
    // pruned-space postings: weight fits a long (255 · 100N), squared
    // products accumulate in decimal — exact, order-free
    // df·frac ≤ N: the relative cut in pure integer arithmetic (no
    // division to mirror), AND'd with the absolute posting cap
    val w = tf.join(dfreq, Seq("t")).crossJoin(nFrame)
      .filter(col("df") * lit(maxDfFrac.toLong) <= col("n") &&
        col("df") <= lit(maxDfCap))
      // decimal(18,0): products hit 37 digits — exact (no precision
      // cap) in Spark AND DuckDB-class engines whose max width is 38
      .select(col("doc_id"), col("t"), col("df"),
        (col("tf") * idf).cast("decimal(18,0)").as("w"))
    val norms = w.groupBy(col("doc_id"))
      .agg(sum(col("w") * col("w")).as("n2"))
    val a = w.filter(col("df") >= 2)
      .select(col("doc_id").as("a"), col("t"), col("w").as("wa"))
    val b = w.select(col("doc_id").as("b"), col("t"), col("w").as("wb"))
    val dots = a.join(b, Seq("t"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(sum(col("wa") * col("wb")).as("dot"))
    val cosine = col("dot").cast("double") /
      (sqrt(col("n2a").cast("double")) * sqrt(col("n2b").cast("double")))
    dots
      .join(norms.select(col("doc_id").as("a"), col("n2").as("n2a")),
        Seq("a"))
      .join(norms.select(col("doc_id").as("b"), col("n2").as("n2b")),
        Seq("b"))
      .withColumn("cos", cosine)
      .filter(col("cos") >= lit(tauNum.toDouble) / lit(tauDen.toDouble))
      .select(col("a"), col("b"), round(col("cos"), 4).as("cos"))
  }
}
