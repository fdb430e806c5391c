package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed point-in-interval join — the attribution primitive
  * (event → campaign window, error → deploy window, log line → incident)
  * that a naive formulation writes as an inequality join, which Spark can
  * only execute as a broadcast-nested-loop or cartesian product: O(P·I)
  * comparisons with no partitioning, the classic 100 TB cliff.
  *
  * The engine form is the BINNED interval join (the DuckDB/`IEJoin`
  * literature's grid method): pick a bin width `w`, replicate each
  * interval to every bin it overlaps (`sequence(lo div w, (hi−1) div w)`
  * + explode — fan-out ⌈len/w⌉ per interval, a constant when `w` is
  * chosen near the median interval length), tag each point with its one
  * containing bin, and equi-join on (key, bin) before the exact
  * `lo ≤ pt < hi` residual predicate. Every pair materializes in exactly
  * ONE bin — the point's — so no dedup pass is needed, and the join is a
  * plain shuffled (or broadcast) hash join that partitions on (key, bin):
  * shuffle volume O(P + I·⌈len/w⌉), comparisons only within co-located
  * bins. Skewed keys fall out the same way any hot equi-join key does
  * (AQE skew split / salting), which no inequality-join plan offers.
  *
  * Bucket arithmetic uses integer `div`, which truncates toward zero —
  * identical to floor division on the non-negative domains used here
  * (epoch timestamps); negative-axis callers must shift first (same
  * contract as [[Cohort]]).
  */
object Intervals {

  /** Join each point to every interval of the same key containing it
    * (half-open: `lo ≤ pt < hi`). Output: all `points` columns plus all
    * non-key `intervals` columns, inner-join semantics (points in no
    * interval drop; points in several intervals emit one row each).
    *
    * @param binWidth bin width in the point/bound units; tune toward the
    *                 median interval length (fan-out = ⌈len/binWidth⌉).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keyCol: String, ptCol: String,
                      loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val iv = intervals
      .filter(col(loCol) < col(hiCol)) // empty intervals match nothing
      .withColumn("__bin", explode(sequence(
        expr(s"cast(`$loCol` as bigint) div ${binWidth}L"),
        expr(s"(cast(`$hiCol` as bigint) - 1) div ${binWidth}L"))))
    val pt = points
      .withColumn("__bin", expr(s"cast(`$ptCol` as bigint) div ${binWidth}L"))
    pt.join(iv, Seq(keyCol, "__bin"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__bin")
  }
}
