package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting via degree-ordered orientation — the
  * standard MapReduce-era bound (Suri & Vassilvitskii WWW'11 /
  * Cohen's MR triangle counting): orient every undirected edge from
  * its lower-(degree, id) endpoint to the higher one, enumerate
  * wedges only at each edge's LOWER endpoint, and close them against
  * the oriented edge list. Orientation caps every node's out-degree
  * at O(√m) (a node of degree d > √m has ≥ d neighbors of degree ≥ d,
  * impossible for more than 2m/d of them), so the wedge set —
  * Σ C(out-deg, 2) — is O(m^1.5) TOTAL regardless of the degree
  * distribution, where naive neighbor-pair enumeration is Σ C(deg, 2)
  * = quadratic at a hub. That O(m^1.5) is the whole scale story: a
  * power-law graph's hubs produce no wedges because every hub edge
  * points INTO the hub.
  *
  * Shape: two hash aggregates build degrees, one equi-join pair
  * attaches them (both sides keyed by node — AQE broadcasts the
  * degree frame when V ≪ E, the common case), one self-join on the
  * wedge center u, and one closing equi-join of the wedge set against
  * the oriented edges on the (v, w) pair key. Every intermediate
  * carries ids + degrees only. Each triangle is found exactly once
  * (at its lowest-rank vertex), so no post-hoc division by 3/6.
  */
object Triangles {

  /** Per-node triangle participation counts: (node, n_triangles), one
    * row per node that closes ≥ 1 triangle. Input: an undirected edge
    * list in `src`/`dst` (duplicates, reversed duplicates, and
    * self-loops tolerated — canonicalized + deduped here).
    */
  def triangleCounts(edges: DataFrame, srcCol: String = "src",
                     dstCol: String = "dst"): DataFrame = {
    val canon = edges.filter(col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
    val deg = canon.select(col("a").as("n"))
      .unionAll(canon.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // orient a—b from the lower (d, n) rank to the higher; keep the
    // head's degree so wedge pairs can be rank-ordered without a
    // further join
    val oriented = canon
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("u"), col("b").as("v"), col("db").as("dv")))
          .otherwise(
            struct(col("b").as("u"), col("a").as("v"), col("da").as("dv")))
          .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
    // wedges at u: rank-ordered out-neighbor pairs (x below y), so the
    // closing edge — if present — is oriented x→y by construction
    val wedges = oriented.select(col("u"), col("v").as("x"), col("dv").as("dx"))
      .join(oriented.select(col("u"), col("v").as("y"), col("dv").as("dy")),
        Seq("u"))
      .filter(struct(col("dx"), col("x")) < struct(col("dy"), col("y")))
      .select(col("u"), col("x"), col("y"))
    val tri = wedges.join(
      oriented.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"))
    tri.select(explode(array(col("u"), col("x"), col("y"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }
}
