package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.text

/** Bigram-MLE language-model scoring — the KenLM-shaped quality signal
  * (CCNet / RedPajama filter corpora by LM perplexity): train bigram
  * statistics on the corpus, then score every document by how probable
  * its own token transitions are under those statistics. High-scoring
  * docs read like the corpus at large; boilerplate, keyboard mash, and
  * wrong-language text score low. This is the model-based complement
  * to t03's heuristics and t16's hashed classifier.
  *
  * No-libm doctrine (t07/t12): no logarithm, no float accumulation.
  * Each transition's MLE probability P(w2|w1) = c2(w1 w2)/c1(w1) is
  * quantized to basis points with INTEGER division — pbp = (10000·c2)
  * div c1 — before any aggregation, so every sum is an exact,
  * order-free integer on any engine/partitioning; the reported score
  * is the per-transition average in bp (avg_pbp = Σ tf·pbp div Σ tf).
  * Scoring the corpus against itself means every bigram has c2 ≥ 1 —
  * no smoothing branch (a held-out variant would add-one the same
  * arithmetic).
  *
  * Scale shape: corpus text is read ONCE — the only corpus-scale pass
  * is the (doc, bigram) tf aggregate (map-side combined). Both count
  * tables derive from it by rollup, never from a second scan: c2 =
  * Σ tf by bigram, c1 = Σ c2 by left token (the context count —
  * occurrences of w followed by anything). The tables are
  * vocab-bounded, so the scoring joins broadcast under AQE on real
  * corpora (vocab ≪ corpus); the final per-doc aggregate is one hash
  * exchange on the doc key.
  */
object NgramLm {

  /** Per-doc LM score: (idCol, n_bigrams, avg_pbp); docs with < 2
    * tokens score (0, 0).
    */
  def bigramScore(docs: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val toks = filter(text.tokens(col(textCol)), t => t =!= "")
    val nPairs = greatest(size(toks) - 1, lit(0))
    val bigrams = zip_with(
      slice(toks, lit(1), nPairs), slice(toks, lit(2), nPairs),
      (a, b) => concat(a, lit(" "), b))
    // the one corpus-scale aggregate: per-(doc, bigram) term frequency
    // (left context carried along — tokens are space-free post-normText,
    // so it is recoverable but cheaper to keep than re-split)
    val docbg = docs
      .select(col(idCol), explode(bigrams).as("b"))
      .withColumn("l", substring_index(col("b"), " ", 1))
      .groupBy(col(idCol), col("b"), col("l"))
      .agg(count(lit(1)).as("tf"))
    // count tables by rollup of docbg — no second corpus pass
    val c2 = docbg.groupBy(col("b").as("__b2"))
      .agg(sum(col("tf")).as("c2"))
    val c1 = c2.groupBy(substring_index(col("__b2"), " ", 1).as("__l1"))
      .agg(sum(col("c2")).as("c1"))
    val scored = docbg
      .join(c2, col("b") === col("__b2"))
      .join(c1, col("l") === col("__l1"))
      .withColumn("pbp", expr("(10000 * c2) div c1"))
      .groupBy(col(idCol))
      .agg(sum(col("tf") * col("pbp")).as("__spbp"),
        sum(col("tf")).as("n_bigrams"))
      .select(col(idCol), col("n_bigrams"),
        expr("__spbp div n_bigrams").as("avg_pbp"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("avg_pbp"), lit(0L)).as("avg_pbp"))
  }
}
