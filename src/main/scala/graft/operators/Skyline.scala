package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline) — the multi-criteria corpus-selection
  * primitive: "keep every document not strictly beaten on BOTH axes"
  * (longer AND cleaner, higher-quality AND cheaper, …). Unlike a scored
  * top-k, the frontier needs no weighting between the axes — it is the
  * set every weighted top-1 would be drawn from.
  *
  * Convention: MAXIMIZE `xCol`, MINIMIZE `yCol` (negate a column to flip
  * its orientation). Row b is dominated iff some row a has
  * `a.x ≥ b.x ∧ a.y ≤ b.y` with at least one strict; the frontier keeps
  * all non-dominated rows, including exact (x, y) duplicates of a
  * frontier point (identical points do not dominate each other).
  *
  * Scale shape — the textbook NOT EXISTS formulation is an O(n²)
  * inequality self-join; the engine instead decomposes through the
  * (x, min y) histogram, the same domain-compression trick as
  * [[Curriculum]]'s distributed ntile:
  *  1. one map-side-combined aggregate collapses the table to
  *     m(x) = min y per DISTINCT x — the only pass over table-scale
  *     data, output |x domain| rows;
  *  2. a running min over the compact histogram ordered x DESC gives
  *     strict(x) = min m over all x' > x. The 2-D dominance test then
  *     collapses to per-row arithmetic: b dominated ⇔
  *     strict(b.x) ≤ b.y  ∨  m(b.x) < b.y
  *     (a strictly-longer row at most as clean, or an equal-length row
  *     strictly cleaner). Only the domain-sized histogram is serialized
  *     through the single-partition window — never the table;
  *  3. the surviving (x, m) frontier steps — at most |x domain| rows,
  *     broadcast-sized by construction — join back to the table, and a
  *     row is kept iff its y EQUALS the frontier m at its x.
  *
  * Total cost: one aggregate, one domain-sized window, one broadcast
  * join — no self-join at any width, no table-scale sort.
  */
object Skyline {

  /** The frontier rows: all input columns, one row per surviving input
    * row. `xCol` maximized, `yCol` minimized; both must be non-null
    * (null rows are dropped — null has no place in a dominance order).
    */
  def paretoFrontier(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val rows = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val hist = rows.groupBy(col(xCol)).agg(min(col(yCol)).as("__m"))
    // strict(x): best y among strictly greater x — the histogram is one
    // row per distinct x, so "1 preceding" in x-descending order is
    // exactly the strictly-greater prefix (no tie leakage).
    val w = Window.orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val steps = hist
      .withColumn("__strict", min(col("__m")).over(w))
      // frontier step ⇔ not dominated by any strictly-greater x
      .filter(col("__strict").isNull || col("__m") < col("__strict"))
      .select(col(xCol), col("__m"))
    rows.join(broadcast(steps), Seq(xCol))
      .filter(col(yCol) === col("__m"))
      .drop("__m")
      .select(df.columns.map(col).toIndexedSeq: _*)
  }
}
