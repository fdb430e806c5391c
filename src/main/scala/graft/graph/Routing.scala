package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.geo

/** Pillar P4 — the in-repo routing query surface (index.html:95-253):
  * graph construction from per-route ordered stops (G1/W9), nearest-node
  * search (G2), single-source shortest paths (G3) and path reconstruction
  * (G4).
  *
  * SSSP is an iterative DataFrame relaxation (distances are non-negative,
  * so Bellman-Ford-style rounds converge to Dijkstra's result). Each round
  * is one shuffle join on the frontier; `localCheckpoint` truncates lineage
  * so plans stay bounded. At cluster scale the frontier join partitions by
  * node id — the standard Pregel layout — and rounds are bounded by the
  * graph diameter.
  */
object Routing {

  /** G1/W9: consecutive-stop edges per route with haversine-m weights
    * (index.html:127-140). Input: (route_id, position, stop_id, lon, lat).
    * Output: directed edges (src, dst, route_id, weight_m).
    */
  def edges(routeStops: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("route_id")).orderBy(col("position"))
    routeStops
      .withColumn("dst", lead(col("stop_id"), 1).over(w))
      .withColumn("dst_lon", lead(col("lon"), 1).over(w))
      .withColumn("dst_lat", lead(col("lat"), 1).over(w))
      .filter(col("dst").isNotNull)
      .select(col("stop_id").as("src"), col("dst"), col("route_id"),
        geo.haversineM(col("lon"), col("lat"), col("dst_lon"), col("dst_lat"))
          .as("weight_m"))
  }

  /** G2: nearest node to a coordinate — min_by over the stop set
    * (index.html:144-149). Ties break on smallest id for determinism.
    */
  def nearestNode(stops: DataFrame, lon: Double, lat: Double): DataFrame =
    stops
      .withColumn("d", geo.haversineM(col("lon"), col("lat"), lit(lon), lit(lat)))
      .orderBy(col("d"), col("stop_id"))
      .limit(1)

  /** G3: single-source shortest paths by iterative relaxation. Returns
    * (node, dist_m, prev, prev_route) for every reachable node. `maxIter`
    * bounds rounds (graph diameter suffices); convergence is detected via
    * an improvement count so it exits early.
    */
  def sssp(edges: DataFrame, sourceId: String, maxIter: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src"), col("dst"), col("route_id"),
      col("weight_m").cast("double")).cache()
    var dist = Seq((sourceId, 0.0, null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("node", "dist_m", "prev", "prev_route")
    // Convergence via a one-job fingerprint: distances only ever decrease,
    // so an unchanged (count, Σdist) pair means no relaxation happened —
    // no extra join-and-count round trip per iteration.
    def fingerprint(df: DataFrame): (Long, Double) = {
      val r = df.agg(count(lit(1)), sum(col("dist_m"))).collect()(0)
      (r.getLong(0), r.getDouble(1))
    }
    var fp = (1L, 0.0)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val cand = dist.join(e, dist("node") === e("src"))
        .select(e("dst").as("node"), (col("dist_m") + col("weight_m")).as("dist_m"),
          dist("node").as("prev"), e("route_id").as("prev_route"))
      val best = dist.unionByName(cand)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("node"))
            .orderBy(col("dist_m"), col("prev"), col("prev_route"))))
        .filter(col("rn") === 1).drop("rn")
        .localCheckpoint()
      val nfp = fingerprint(best)
      converged = nfp == fp
      fp = nfp
      dist = best
      i += 1
    }
    dist
  }

  /** G4: unwind the predecessor chain into the (tiny) path — driver-side,
    * like the reference's result rendering (index.html:180-193).
    */
  def shortestPath(edges: DataFrame, sourceId: String, targetId: String,
                   maxIter: Int = 50): Seq[(String, Option[String], Double)] = {
    val dist = sssp(edges, sourceId, maxIter)
      .select("node", "dist_m", "prev", "prev_route").collect()
      .map(r => r.getString(0) ->
        (Option(r.getString(2)), Option(r.getString(3)), r.getDouble(1))).toMap
    if (!dist.contains(targetId)) return Seq.empty
    val path = scala.collection.mutable.ArrayBuffer.empty[(String, Option[String], Double)]
    var cur: Option[String] = Some(targetId)
    while (cur.isDefined) {
      val (prev, route, d) = dist(cur.get)
      path.prepend((cur.get, route, d))
      cur = prev
    }
    path.toSeq
  }

  /** Unweighted BFS hop counts from a source — the oracle-checkable variant
    * (DuckDB mirrors it with a recursive CTE). Same loop structure as sssp.
    */
  def bfsHops(edges: DataFrame, sourceId: String, maxIter: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src"), col("dst")).cache()
    var dist = Seq((sourceId, 0)).toDF("node", "hops")
    var fp = (1L, 0L)
    var i = 0
    var converged = false
    while (!converged && i < maxIter) {
      val cand = dist.join(e, dist("node") === e("src"))
        .select(e("dst").as("node"), (col("hops") + 1).as("hops"))
      val best = dist.unionByName(cand)
        .groupBy("node").agg(min("hops").as("hops"))
        .localCheckpoint()
      // hop counts only decrease → unchanged (count, Σhops) = converged
      val r = best.agg(count(lit(1)), sum(col("hops"))).collect()(0)
      val nfp = (r.getLong(0), r.getLong(1))
      converged = nfp == fp
      fp = nfp
      dist = best
      i += 1
    }
    dist
  }
}
