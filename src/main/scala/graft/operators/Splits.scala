package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic dataset splitting for training pipelines: every id maps
  * to a stable percentage bucket via the engine's md5-prefix hash (NOT
  * Spark's murmur `hash()` — md5 is engine-independent, so the oracle and
  * any other system can reproduce the exact split), and buckets map to
  * named splits by cumulative percentage.
  *
  * Per-row expression — no shuffle, no sampling nondeterminism, stable
  * under reruns and partitioning changes. Group-stratified splits (all of
  * a user's docs in one split) fall out by hashing the group key instead
  * of the row id.
  */
object Splits {

  /** Stable bucket in [0, 100) for an id column. */
  def pctBucket(idCol: Column, salt: Int = 0): Column =
    graft.functions.text.saltedHash32(idCol.cast("string"), salt) % 100

  /** Named split by cumulative percentages, e.g.
    * `Seq("train" -> 90, "val" -> 5, "test" -> 5)` (must sum to 100).
    */
  def assignSplit(idCol: Column, cuts: Seq[(String, Int)],
                  salt: Int = 0): Column = {
    require(cuts.map(_._2).sum == 100, "split percentages must sum to 100")
    val b = pctBucket(idCol, salt)
    val cum = cuts.scanLeft(0)(_ + _._2).tail
    cuts.zip(cum).init.foldRight(lit(cuts.last._1)) {
      case (((name, _), upper), el) => when(b < upper, name).otherwise(el)
    }
  }

  /** Deterministic STRATIFIED sampling predicate: keep a row iff its
    * id's stable bucket falls under its stratum's percentage — per-class
    * downsampling (e.g. rebalance a language-skewed corpus) as a pure
    * per-row filter: no sampleBy nondeterminism, no shuffle, same rows
    * kept on every rerun/engine. Unlisted strata keep `defaultPct`.
    */
  def stratifiedKeep(idCol: Column, stratumCol: Column,
                     pct: Seq[(String, Int)], defaultPct: Int = 100,
                     salt: Int = 0): Column = {
    require((defaultPct +: pct.map(_._2)).forall(p => p >= 0 && p <= 100),
      "percentages must be within [0, 100]")
    val rate = pct.foldRight(lit(defaultPct)) {
      case ((stratum, p), el) => when(stratumCol === stratum, p).otherwise(el)
    }
    pctBucket(idCol, salt) < rate
  }

  /** Token-budget source mixing: keep each group's rows, in a
    * deterministic pseudo-random order (md5 bucket, then id), until the
    * group's token budget is reached — greedy admission, so the first row
    * that crosses the budget is still kept (every group with any data
    * contributes at least one row). This is the data-mixing primitive of
    * a training pipeline: cap each source/domain at N tokens instead of
    * letting corpus size dictate the mixture.
    *
    * Scale shape: one shuffle on the group key + an ordered window per
    * group. Exact greedy admission is inherently sequential per group;
    * if one group dwarfs the rest, pre-thin it with [[stratifiedKeep]]
    * (rate ≈ budget/group-tokens) before the exact pass so the window
    * never scans far past the budget.
    */
  def capTokensPerGroup(df: DataFrame, groupCol: String, idCol: String,
                        tokenCol: String, budget: Long,
                        salt: Int = 0): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(pctBucket(col(idCol), salt), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokenCol)).over(w))
      .filter(col("__cum") - col(tokenCol) < budget)
      .drop("__cum")
  }
}
