package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation primitives (SURVEY §7.4.8 scale posture).
  *
  * AQE's skew-join split handles sort-merge joins whose partitions are
  * measurably oversized at runtime; these helpers cover the cases AQE
  * cannot: replicating a small-but-not-tiny build side across hot keys,
  * and exact distinct counts on keys with pathological value fan-in.
  * Both are pure plan rewrites — results are identical to the naive form
  * (proven by SkewSpec) — so callers opt in per hot path.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, with the hot-key pressure spread
    * over `salts` buckets: every big row gets a deterministic salt from a
    * uniform hash of its whole row id-space, the small side is replicated
    * `salts` times, and the join key becomes (key, salt). Use when the
    * small side is too big to broadcast and the key histogram is skewed —
    * each hot key's rows then land on `salts` reducers instead of one.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1)
    // right/full outer are NOT salt-replicable: an unmatched small-side
    // key would surface once per salt replica (salts× duplicate rows).
    val ok = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")
    require(ok.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports big-side-preserving join types only, got $joinType")
    val saltedBig = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toSeq: _*), lit(salts)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Exact COUNT(DISTINCT valueCol) per key, safe under value fan-in: the
    * first aggregation distributes by (key, value) — spreading a hot key
    * across the cluster — and emits one row per distinct pair; the second
    * counts pairs per key. Equivalent to
    * `groupBy(key).agg(countDistinct(value))`, whose single shuffle sends
    * every value of a hot key to one reducer.
    */
  def skewSafeDistinctCount(df: DataFrame, key: String, valueCol: String,
                            outCol: String = "n_distinct"): DataFrame =
    df.select(col(key), col(valueCol))
      .groupBy(col(key), col(valueCol)).agg(lit(1))
      .groupBy(col(key)).agg(count(lit(1)).as(outCol))

  /** Deterministic per-row salt column in [0, salts): uniform hash of the
    * given columns. Exposed for salted windows — append it to a window's
    * partition keys to split a hot partition, then merge the per-salt
    * results with a second pass.
    */
  def saltColumn(salts: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(salts))
}
