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
  * at C(maxDeg,2) per left node.
  *
  * Exchange economics (the r12 adjudication): every step between the
  * raw edges and the final pair aggregation is keyed by the LEFT node,
  * so ONE up-front hash exchange on `__l` serves all of them — the
  * (l, r) dedup and the degree count are aggregates whose clustering
  * requirement a hash(l) layout already satisfies (the partitioning
  * subset rule), and both the degree gate and the quadratic self-join
  * arrive co-partitioned. The whole operator plans exactly TWO
  * exchanges: the raw edge exchange in, the (r1, r2) pair aggregation
  * out (PlanSpec pins the count). The pair exchange is the intrinsic
  * one — C(deg,2) rows per kept left node is the operator's output
  * volume, not a plan artifact. Hub safety is unchanged: degree is a
  * streaming count (no per-group collected buffers), and hubs are gone
  * before any quadratic work.
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
    import org.apache.spark.sql.expressions.Window
    val d = edges.select(col(leftCol).as("__l"), col(rightCol).as("__r"))
      .repartition(col("__l"))
      .dropDuplicates("__l", "__r")
    // degree gate as a whole-group window count — no join: the count
    // rides the hash(__l) layout (one in-partition sort), and WindowExec
    // spills per group, so a 10⁸-degree hub streams through the COUNT
    // without any unbounded aggregation buffer and is dropped here,
    // BEFORE anything quadratic or collected
    val kept = d.withColumn("__d",
        count(lit(1)).over(Window.partitionBy(col("__l"))))
      .filter(col("__d") <= maxDeg)
    // pairs by explode over the per-left right-set — bounded at maxDeg
    // elements per group BY the gate above, so the collect_list buffer
    // is capped by construction; sort_array makes i<j positions emit
    // r1 < r2 pairs directly. This replaces the classic self-join: no
    // second sort, no join, the same C(deg,2) output rows generated in
    // codegen.
    val pairs = kept.groupBy(col("__l"))
      .agg(sort_array(collect_list(col("__r"))).as("__rs"))
      .select(posexplode(col("__rs")).as(Seq("__i", "r1")), col("__rs"))
      .select(col("r1"),
        explode(slice(col("__rs"), col("__i") + lit(2), lit(maxDeg))).as("r2"))
    // The pair aggregation is the operator's one data-volume exchange
    // (C(deg,2) rows per kept left node). For 32-bit right ids the
    // (r1, r2) key PACKS bijectively into one long ((u32 << 32) | u32 —
    // the masks make negatives pack too), halving the shuffled key
    // bytes and turning the aggregate's grouping into single-long
    // hashing: measured 3.8 → 2.9 s on the sf1 co-purchase graph.
    // Wider types keep the two-column key (a long pair can't pack).
    if (edges.schema(rightCol).dataType ==
        org.apache.spark.sql.types.IntegerType) {
      val u = (c: org.apache.spark.sql.Column) =>
        c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
      pairs.select(shiftleft(u(col("r1")), 32).bitwiseOR(u(col("r2")))
          .as("__pk"))
        .groupBy(col("__pk")).agg(count(lit(1)).as("weight"))
        // arithmetic shifts sign-extend each 32-bit word back to its
        // original signed value — in int range by construction, so the
        // casts are ANSI-safe
        .select(shiftright(col("__pk"), 32).cast("int").as("r1"),
          shiftright(shiftleft(col("__pk"), 32), 32).cast("int").as("r2"),
          col("weight"))
    } else
      pairs.groupBy(col("r1"), col("r2"))
        .agg(count(lit(1)).as("weight"))
  }
}
