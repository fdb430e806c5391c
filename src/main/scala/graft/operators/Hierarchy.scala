package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recursive-hierarchy aggregation — the BOM-explosion / org-chart
  * rollup class (SQL's RECURSIVE CTE + GROUP BY): every node of a
  * parent-pointer forest reports the aggregate over its whole subtree.
  * A single-node engine walks the recursion row-by-row; here the
  * fixpoint is a LEVEL-SYNCHRONOUS loop of joins — the same doctrine as
  * the graph frontier loops (graph.Routing/Ranking), so 10⁹-node
  * hierarchies cost depth × O(V) shuffles, not O(V) recursion steps.
  *
  * Recurrence (exact integers): total₀(k) = value(k);
  *   totalᵢ(k) = value(k) + Σ_{parent(c)=k} totalᵢ₋₁(c)
  * After i rounds totalᵢ is exact for every node whose subtree HEIGHT
  * is ≤ i (bottom-up induction: leaves are exact at round 0), and once
  * every node is exact the recurrence is a fixpoint — extra rounds are
  * no-ops, so `rounds` only needs to be ≥ the forest height (callers
  * derive it from the key-generation scheme or a driver-side scalar;
  * overshoot is harmless by the fixpoint property, pinned in
  * HierarchySpec).
  */
object Hierarchy {

  /** Subtree totals over a parent-pointer forest.
    * `nodes`: one row per node — (keyCol, parentCol, valueCol); roots
    * have NULL parent; keys must be unique and the structure acyclic
    * (a cycle never converges — caller contract, as for any recursive
    * CTE). Output: (k, total, n_desc) — the value sum over the node's
    * subtree (itself included) and its proper-descendant count.
    */
  def subtreeAggregate(nodes: DataFrame, keyCol: String, parentCol: String,
                       valueCol: String, rounds: Int,
                       checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 0, "rounds must be non-negative")
    val spark = nodes.sparkSession
    val ckpt = graft.operators.Iteration.materializer(spark, checkpointDir)
    val base = ckpt(nodes.select(col(keyCol).as("k"),
      col(parentCol).as("p"), col(valueCol).cast("long").as("v")))
    val parts = graft.operators.Iteration.roundPartitions(spark, base.count())
    graft.operators.Iteration.withShufflePartitions(spark, parts) {
      // the parent pointer RIDES the loop frame — recovering it with a
      // per-round t⋈base join would add a V-sized shuffle join per
      // round for a column the rebuild already has in hand
      var t = ckpt(base.select(col("k"), col("p"),
        col("v").as("total"), lit(0L).as("n_desc")))
      var i = 0
      while (i < rounds) {
        // children's round-(i-1) totals, grouped to their parent: one
        // V-sized aggregate + one V-sized join per round — nothing
        // accumulates across rounds (each round rebuilds from base)
        // the group key is ALIASED to a fresh attribute: t and base
        // share the `p` attribute lineage, and an un-aliased groupBy
        // would put the same attribute on both sides of the join
        // (DetectAmbiguousSelfJoin rejects it)
        val up = t.filter(col("p").isNotNull)
          .groupBy(col("p").as("__up_p"))
          .agg(sum(col("total")).as("ct"),
            sum(col("n_desc") + 1L).as("cd"))
        t = ckpt(base
          .join(up, base("k") === up("__up_p"), "left")
          .select(base("k"), base("p"),
            (col("v") + coalesce(col("ct"), lit(0L))).as("total"),
            coalesce(col("cd"), lit(0L)).as("n_desc")))
        i += 1
      }
      t.select(col("k"), col("total"), col("n_desc"))
    }
  }
}
