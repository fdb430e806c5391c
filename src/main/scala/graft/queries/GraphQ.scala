package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.graph.Routing

/** Graph/routing operators (SURVEY §2.10) over a deterministic synthetic
  * graph derived from the nation table: each nation key n gets directed
  * edges n→(7n+3) mod 25 and n→(11n+5) mod 25. BFS hop counts are oracle-
  * checked against a DuckDB recursive CTE; weighted SSSP + path
  * reconstruction are covered by RoutingSpec fixtures (no SQL equivalent).
  */
object GraphQ extends QueryPack {

  /** The synthetic edge list (route_id labels the generating formula). */
  def syntheticEdges(s: SparkSession, dir: String): DataFrame = {
    val n = Tables(s, dir).nation.select(col("n_nationkey").cast("int").as("k"))
    n.select(col("k").cast("string").as("src"),
        ((col("k") * 7 + 3) % 25).cast("string").as("dst"),
        lit("a").as("route_id"),
        ((col("k") % 5) + 1).cast("double").as("weight_m"))
      .unionByName(n.select(col("k").cast("string").as("src"),
        ((col("k") * 11 + 5) % 25).cast("string").as("dst"),
        lit("b").as("route_id"),
        ((col("k") % 3) + 1).cast("double").as("weight_m")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r01_bfs_hops" -> { (s, dir) =>
      Routing.bfsHops(syntheticEdges(s, dir), "0", maxIter = 25)
        .orderBy(col("node"))
    },

    "r02_sssp_distances" -> { (s, dir) =>
      // Weighted SSSP — oracled against a hop-bounded recursive-CTE walk
      // with min-dist aggregation (shortest paths are simple, so ≤24 hops
      // covers every optimum on the 25-node graph).
      Routing.sssp(syntheticEdges(s, dir), "0", maxIter = 25)
        .select(col("node"), round(col("dist_m"), 6).as("dist"))
        .orderBy(col("node"))
    }
  )

  def oracle: Map[String, String] = Map(
    "r01_bfs_hops" ->
      """WITH RECURSIVE e AS (
        |  SELECT CAST(n_nationkey AS VARCHAR) AS src,
        |         CAST((n_nationkey*7+3)%25 AS VARCHAR) AS dst FROM nation
        |  UNION ALL
        |  SELECT CAST(n_nationkey AS VARCHAR),
        |         CAST((n_nationkey*11+5)%25 AS VARCHAR) FROM nation),
        |walk(node, hops) AS (
        |  SELECT '0', 0
        |  UNION
        |  SELECT e.dst, w.hops + 1 FROM walk w JOIN e ON e.src = w.node
        |  WHERE w.hops < 25)
        |SELECT node, CAST(MIN(hops) AS INT) AS hops FROM walk
        |GROUP BY node ORDER BY node""".stripMargin,

    // Weighted SSSP: enumerate every ≤25-hop walk from the source (UNION
    // dedups on (node, dist, hops) so the state stays tiny on 25 nodes),
    // then min-dist per node = Dijkstra's answer.
    "r02_sssp_distances" ->
      """WITH RECURSIVE e AS (
        |  SELECT CAST(n_nationkey AS VARCHAR) AS src,
        |         CAST((n_nationkey*7+3)%25 AS VARCHAR) AS dst,
        |         CAST((n_nationkey%5)+1 AS DOUBLE) AS w FROM nation
        |  UNION ALL
        |  SELECT CAST(n_nationkey AS VARCHAR),
        |         CAST((n_nationkey*11+5)%25 AS VARCHAR),
        |         CAST((n_nationkey%3)+1 AS DOUBLE) FROM nation),
        |walk(node, d, hops) AS (
        |  SELECT '0', CAST(0 AS DOUBLE), 0
        |  UNION
        |  SELECT e.dst, w.d + e.w, w.hops + 1 FROM walk w JOIN e ON e.src = w.node
        |  WHERE w.hops < 25)
        |SELECT node, round(MIN(d), 6) AS dist FROM walk
        |GROUP BY node ORDER BY node""".stripMargin
  )
}
