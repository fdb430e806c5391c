package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bipartite projection — build a co-membership graph from a two-mode
  * edge set: (customer, supplier) → supplier pairs weighted by shared
  * customers, (user, repo) → repo co-contribution, (doc, entity) →
  * entity co-occurrence. The standard graph-CONSTRUCTION step before
  * any of the r-family algorithms run on data that arrives as
  * memberships rather than edges.
  *
  * The scale hazard is quadratic hub fan-out: the self-join emits
  * C(deg,2) pairs per left node, so ONE left node connected to 10⁶
  * rights would emit 5·10¹¹ pairs. `maxDeg` drops left nodes above the
  * cap before the join — the same hot-bucket guard as the LSH dedups
  * ([[graft.operators.Dedup]] capBuckets): a left node shared by
  * everyone carries no co-membership signal (its pairs are noise, the
  * bipartite analogue of a stopword), and dropping it bounds the join
  * at C(maxDeg,2) per left node. The degree filter is one
  * map-side-combined aggregate; the pair join partitions on the left
  * key and its output aggregates map-side onto (r1, r2).
  */
object Projection {

  /** Co-membership pairs (r1 < r2) with `weight` = number of distinct
    * left nodes shared, over left nodes with ≤ `maxDeg` distinct
    * rights. Input edges are deduplicated first, so multiplicity never
    * inflates a weight.
    */
  def bipartiteProject(edges: DataFrame, leftCol: String, rightCol: String,
                       maxDeg: Int): DataFrame = {
    require(maxDeg >= 2, s"maxDeg must be >= 2, got $maxDeg")
    val e = edges.select(col(leftCol).as("__l"), col(rightCol).as("__r"))
      .distinct()
    val kept = e.join(
      e.groupBy(col("__l")).agg(count(lit(1)).as("__d"))
        .filter(col("__d") <= maxDeg).select("__l"),
      "__l")
    kept.select(col("__l"), col("__r").as("r1"))
      .join(kept.select(col("__l"), col("__r").as("r2")),
        Seq("__l"))
      .filter(col("r1") < col("r2"))
      .groupBy(col("r1"), col("r2"))
      .agg(count(lit(1)).as("weight"))
  }
}
