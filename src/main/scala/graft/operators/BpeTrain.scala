package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.text

/** BPE merge induction — tokenizer vocabulary TRAINING over the corpus
  * (Sennrich et al. 2016, the subword algorithm every LLM tokenizer
  * family descends from). Complements the inference-side tokenizers in
  * [[graft.functions.text]]: those apply a fixed rule; this LEARNS the
  * merge table from data.
  *
  * Algorithm (classic, word-level): collapse the corpus to its distinct
  * normalized words with frequencies; symbolize each word as its
  * character sequence; then `k` times pick the adjacent symbol pair
  * with the highest frequency-weighted count (ties: lexicographically
  * smallest pair — deterministic on any engine) and fuse its
  * occurrences left-to-right non-overlapping in every word.
  *
  * Pair counting weights EVERY adjacent position by the word's corpus
  * frequency (Sennrich's get_stats — overlapping runs count each
  * position). The merge pass is expressed as two sequential
  * whole-string `replace` calls over the space-joined symbol string
  * padded with sentinels: one replace fuses left-to-right skipping
  * boundary-sharing occurrences, and those skipped occurrences are
  * isolated from each other by a fused neighbor, so the second pass
  * finishes exactly the left-to-right fold — textually mirrorable in
  * any engine with a non-regex replace (the DuckDB oracle runs the
  * SAME two replaces).
  *
  * Scale shape: the ONLY corpus-sized pass is the word-frequency
  * aggregation (map-side combined; at 100 TB the distinct-word table is
  * millions of rows, not trillions — the same collapse every production
  * BPE trainer performs). Each of the `k` rounds is then one
  * pair-count aggregation over that bounded vocab table plus a 1-row
  * argmax to the driver (the merge being learned IS the model
  * artifact, so a driver-sized result per round is the point, not a
  * bottleneck); the symbol table is localCheckpoint'd per round so
  * round `i` never re-executes rounds 1..i-1.
  *
  * Output: (merge_rank 1-based, lhs, rhs, cnt) — one row per learned
  * merge, fewer than `k` rows iff the vocabulary runs out of pairs.
  */
object BpeTrain {

  private val outSchema = StructType(Seq(
    StructField("merge_rank", IntegerType, nullable = false),
    StructField("lhs", StringType, nullable = false),
    StructField("rhs", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false)))

  /** Learn the top-`k` BPE merges from `docs(textCol)`. */
  def learnMerges(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val spark = docs.sparkSession
    val wordFreq = docs
      .select(explode(split(text.normText(col(textCol)), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    // symbolize: chars joined by single spaces ("abc" -> "a b c")
    var syms = wordFreq
      .select(concat_ws(" ", split(col("word"), "")).as("sym"), col("freq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var exhausted = false
    for (rank <- 1 to k if !exhausted) {
      val best = syms
        .select(split(col("sym"), " ").as("a"), col("freq"))
        .filter(size(col("a")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(a) - 2), " +
            "j -> struct(a[j] AS l, a[j + 1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Row(rank, l, r, cnt)
        val pat = lit(s" $l $r ")
        val rep = lit(s" $l$r ")
        val padded = concat(lit(" "), col("sym"), lit(" "))
        syms = syms
          .select(trim(replace(replace(padded, pat, rep), pat, rep))
            .as("sym"), col("freq"))
          .localCheckpoint()
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq, 1), outSchema)
  }
}
