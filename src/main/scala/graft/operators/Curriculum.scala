package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curriculum binning: split a scored corpus into k equal-size phases
  * in global score order (best-first), the ordering step of
  * curriculum-learning data prep ("train on clean text first, noisy
  * web text last"). Semantically identical to
  * `ntile(k) OVER (ORDER BY score DESC, id)` — but a global ntile is a
  * single-partition sort of the whole corpus, which is exactly the
  * plan that dies at 100 TB.
  *
  * Scale shape — the global rank decomposes into two bounded pieces
  * when the score domain is small (here: integer quality basis points,
  * ≤ 10⁴+1 distinct values):
  *   1. ONE map-side-combined aggregate builds the score histogram
  *      (|domain| rows); its exclusive prefix sum runs on a
  *      single-partition window over that TINY frame (|domain| rows
  *      cross the exchange, never corpus rows).
  *   2. `row_number` PARTITIONED by score value ranks docs within
  *      their score — a distributed hash-partitioned sort whose
  *      largest partition is the hottest score bucket, not the corpus.
  *   global rank r = prefix(score) + within-score rank, then ntile's
  *   arithmetic (first n mod k phases get ⌈n/k⌉ rows) maps r → phase
  *   in closed form. Every corpus-scale step is hash-partitioned; the
  *   only serialized data is the histogram.
  *
  * Ties broken by `tieCol` (must be unique per row) so the assignment
  * is deterministic and engine-independent.
  */
object Curriculum {

  /** Adds an integer `phase` column (1..k, 1 = highest scores), exactly
    * matching `ntile(k) OVER (ORDER BY scoreCol DESC, tieCol ASC)`.
    * `scoreCol` must be integral with a bounded domain (the histogram
    * is materialized); `tieCol` must be unique.
    */
  def phases(df: DataFrame, scoreCol: String, tieCol: String,
             k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val hist = df.groupBy(col(scoreCol)).agg(count(lit(1)).as("__c"))
    // exclusive prefix count of rows with a HIGHER score; the window is
    // unpartitioned by design — it only ever sees |score domain| rows
    val pre = hist.withColumn("__pre",
      coalesce(sum(col("__c")).over(
        Window.orderBy(col(scoreCol).desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val n = hist.agg(sum(col("__c")).as("__n"))
    val rn = row_number().over(
      Window.partitionBy(col(scoreCol)).orderBy(col(tieCol)))
    // ntile arithmetic on the 1-based global rank r: base = n div k,
    // rem = n mod k; phases 1..rem hold base+1 rows, the rest base.
    // `div` (not `/`: double on longs) throughout; the ELSE's division
    // by base is unreachable when base = 0 (head = n covers every r)
    // and CASE evaluates lazily, so ANSI mode never sees a div-by-zero.
    df.join(broadcast(pre), Seq(scoreCol))
      .crossJoin(broadcast(n))
      .withColumn("__r", col("__pre") + rn)
      .withColumn("phase", expr(
        s"""CAST(CASE
           |  WHEN __r <= (__n div $k + 1) * (__n % $k)
           |  THEN (__r - 1) div (__n div $k + 1) + 1
           |  ELSE __n % $k
           |       + (__r - (__n div $k + 1) * (__n % $k) - 1) div (__n div $k)
           |       + 1
           |END AS INT)""".stripMargin))
      .drop("__c", "__pre", "__n", "__r")
  }
}
