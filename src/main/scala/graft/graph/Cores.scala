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
  * Scale shape — DELTA peeling, not recompute-from-scratch: the degree
  * frame is maintained incrementally. Each round removes the nodes
  * whose maintained degree fell below k, then decrements the survivors'
  * degrees by their edge count INTO the removed set. Only the removed
  * frontier's edges are touched: the edge frame is probed with a
  * broadcast semi-join on the frontier (no O(E) exchange — the same
  * frontier doctrine as Routing.bfsHops), the resulting delta is
  * frontier-edge-scale, and the degree update joins that small delta
  * against the shrinking degree frame. A mass round whose frontier
  * exceeds `broadcastRemovedMax` falls back to a plain equi-join for
  * that round (AQE picks the exchange) — on real graphs that is at most
  * the first round; the cascade tail is always frontier-scale. Per
  * round this is one exchange-free O(E) scan plus frontier-scale
  * shuffles, vs the naive peel's two O(E) shuffle joins + full
  * re-aggregate; rounds = peel depth either way (typically ≪ V).
  *
  * The degree frame (id + count, shrinking monotonically) is
  * materialized per round through the shared Iteration materializer —
  * localCheckpoint by default, reliable checkpoint dir in cluster mode
  * (executor loss mid-peel survives) — so lineage stays flat and the
  * convergence test is the frontier count the round computes anyway.
  *
  * `edges` must be SYMMETRIC (both directions present) and duplicate-
  * free; degree then equals the out-edge count per src.
  */
object Cores {

  /** Nodes of the k-core: one `node` column, the fixpoint of the peel. */
  def kCore(edges: DataFrame, k: Int,
            checkpointDir: Option[String] = None,
            prePartitionEdges: Boolean = true,
            broadcastRemovedMax: Long = 5000000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = edges.sparkSession
    val ckpt = graft.operators.Iteration.materializer(spark, checkpointDir)
    val eSel = edges.select(col("src"), col("dst"))
    // dst is the probe key of every delta join; hash-spread blocks keep
    // the (rare) fallback-round shuffle balanced
    val e = ckpt(if (prePartitionEdges) eSel.repartition(col("dst")) else eSel)
    // one O(E) aggregate seeds the maintained degree frame
    var deg = ckpt(e.groupBy(col("src")).agg(count(lit(1)).as("__deg")))
    var removed = deg.filter(col("__deg") < k).select(col("src").as("dst"))
    var m = removed.count()
    while (m > 0) {
      val frontier =
        if (m <= broadcastRemovedMax) broadcast(removed) else removed
      // decrements: survivors' edge counts INTO this round's removed set
      // (edges between two removed nodes produce delta rows for removed
      // srcs — the survivor filter below drops them)
      val delta = e.join(frontier, Seq("dst"))
        .groupBy(col("src")).agg(count(lit(1)).as("__dec"))
      deg = ckpt(deg.filter(col("__deg") >= k)
        .join(delta, Seq("src"), "left")
        .select(col("src"),
          (col("__deg") - coalesce(col("__dec"), lit(0L))).as("__deg")))
      removed = deg.filter(col("__deg") < k).select(col("src").as("dst"))
      m = removed.count()
    }
    deg.select(col("src").as("node"))
  }
}
