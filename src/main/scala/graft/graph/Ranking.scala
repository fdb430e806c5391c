package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-analysis ranking over an edge list — the crawl-pipeline side of
  * the graph surface (domain/page ranking for source weighting is a
  * standard ingredient of large-scale training-data curation, alongside
  * the dedup/contamination passes in `graft.operators`).
  *
  * PageRank (Brin & Page 1998) with EXACT INTEGER arithmetic: ranks are
  * maintained in fixed-point units of 1/`scale`, every per-edge
  * contribution is an integer division, and every update is an
  * order-free integer sum — so the result is bit-identical on any
  * engine, partitioning, or plan, and a SQL oracle can hash-match it
  * (floating-point PageRank cannot: cross-engine libm and sum-order
  * drift). Truncation deterministically sheds < 1 unit of mass per
  * edge per round; that loss is part of the defined semantics and the
  * oracle reproduces it exactly.
  */
object Ranking {

  /** Integer PageRank over directed `edges` (src, dst) for a FIXED
    * number of rounds (the production form: rank pipelines run a fixed
    * round budget; convergence detection on exact integers adds a probe
    * job per round for no decision value at typical budgets).
    *
    * Semantics per round, all in integer units:
    *   contrib(u→v) = r(u) div outdeg(u)
    *   r'(v)        = (15·scale) div 100  +  (85 · Σ contrib(·→v)) div 100
    * Nodes with no in-edges keep the base term; nodes with no out-edges
    * (dangling) keep their rank but redistribute nothing — the standard
    * simplification, acceptable for ranking use (no normalized
    * probability interpretation is claimed).
    *
    * Scale shape — ONE shuffle per round: the edge frame is materialized
    * once, out-degree attached, in the Pregel hash(src) layout (the
    * degree join forces that layout even unhinted; the checkpoint's
    * LogicalRDD preserves it — see Routing.bfsHops). Each round's
    * rank join then meets it exchange-free (ranks are hash(node)
    * partitioned from the previous round), the dst-keyed inflow
    * aggregation is the round's only exchange, and the node-frame left
    * join that re-attaches rankless nodes is colocated with it. Rounds
    * cost O(E) map work + one O(E→V) shuffle — nothing accumulates.
    *
    * `scale` bounds: Σ ranks ≤ V·scale, and the update multiplies by 85,
    * so V·scale must stay below 2^63/85 ≈ 10^17 — at 10^9 nodes the
    * default 10^6 scale is exactly at the safe bound; lower `scale` for
    * larger graphs.
    *
    * `checkpointDir`: reliable per-round checkpoints for cluster runs
    * (see [[graft.operators.Iteration.materializer]]).
    * Output: (node, r) — r in units of 1/scale.
    */
  def pageRank(edges: DataFrame, iters: Int, scale: Long = 1000000L,
               checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    val spark = edges.sparkSession
    val ckpt = graft.operators.Iteration.materializer(spark, checkpointDir)
    val e0 = edges.select(col("src"), col("dst"))
    // out-degree attached to every edge ONCE; the src-keyed aggregate +
    // join leave the materialized frame hash(src)-partitioned, which is
    // the layout every round's rank join reuses
    val deg = e0.groupBy(col("src")).agg(count(lit(1)).as("od"))
    val ew = ckpt(e0.join(deg, Seq("src")))
    val base = 15L * scale / 100
    val nodes = ckpt(
      e0.select(col("src").as("node"))
        .unionByName(e0.select(col("dst").as("node")))
        .distinct())
    var r = ckpt(nodes.withColumn("r", lit(scale)))
    var i = 0
    while (i < iters) {
      // ew is hash(src), r is hash(node): same key values → exchange-free
      val inflow = ew.join(r, ew("src") === r("node"))
        .select(col("dst").as("node"), expr("r div od").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
      // nodes is hash(node), inflow comes out hash(node): colocated left
      // join re-attaches nodes that received nothing this round
      r = ckpt(nodes
        .join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("(85 * coalesce(inflow, 0L)) div 100"))
            .as("r")))
      i += 1
    }
    r
  }
}
