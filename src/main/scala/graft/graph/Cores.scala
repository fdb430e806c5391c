package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition (fixed k): iteratively remove every node whose
  * degree within the surviving subgraph is below k, to fixpoint — the
  * classic graph-density filter (Seidman '83). In a data-curation
  * pipeline this is the link-graph hygiene pass: spam farms and
  * boilerplate hubs survive degree thresholds but not coreness, and the
  * k-core of a domain graph is the standard "well-connected web" slice
  * crawl frontiers are seeded from.
  *
  * Scale shape: each round is two equi-joins of the edge frame against
  * the alive set plus one map-side-combined degree aggregate — O(E)
  * shuffle per round, O(peel depth) rounds (the peel converges as soon
  * as one round removes nothing; depth is typically ≪ V on real
  * graphs). The alive frame (ids only, shrinking monotonically) is
  * materialized per round through the shared Iteration materializer —
  * localCheckpoint by default, reliable checkpoint dir in cluster mode
  * (executor loss mid-peel survives) — so lineage stays flat. Since
  * next ⊆ alive by construction, the convergence test is a COUNT
  * comparison, not a set diff. With the edge frame written src-bucketed
  * (sources/Warehouse), the per-round join plans exchange-free on the
  * O(E) side — the r08 doctrine.
  *
  * `edges` must be SYMMETRIC (both directions present) and duplicate-
  * free; degree then equals the out-edge count per src.
  */
object Cores {

  /** Nodes of the k-core: one `node` column, the fixpoint of the peel. */
  def kCore(edges: DataFrame, k: Int,
            checkpointDir: Option[String] = None,
            prePartitionEdges: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = edges.sparkSession
    val ckpt = graft.operators.Iteration.materializer(spark, checkpointDir)
    val eSel = edges.select(col("src"), col("dst"))
    // same physical-balance rationale as Routing.bfsHops: hash-spread
    // blocks keep every round's shuffle map stage balanced
    val e = ckpt(if (prePartitionEdges) eSel.repartition(col("src")) else eSel)
    var alive = ckpt(e.select(col("src").as("node")).distinct())
    var n = alive.count()
    var converged = n == 0
    while (!converged) {
      val deg = e
        .join(alive.select(col("node").as("src")), Seq("src"))
        .join(alive.select(col("node").as("dst")), Seq("dst"))
        .groupBy(col("src"))
        .agg(count(lit(1)).as("__deg"))
      val next = ckpt(deg.filter(col("__deg") >= k)
        .select(col("src").as("node")))
      val m = next.count()
      // next ⊆ alive (only alive srcs survive the joins), so equal
      // cardinality means equal sets — fixpoint
      converged = m == n || m == 0
      alive = next
      n = m
    }
    alive
  }
}
