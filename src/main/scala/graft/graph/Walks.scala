package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Random-walk CORPUS GENERATION (DeepWalk, Perozzi et al. 2014 —
  * truncated random walks as training sequences; the node2vec/metapath
  * family generalizes the same sampler): the bridge between the graph
  * tier and the tokenizer tier of a training-data pipeline — walks over
  * an entity graph ARE sequence corpus rows (skip-gram windows, session
  * synthesis, graph-aware negatives).
  *
  * The step draw is DETERMINISTIC (the p16 A-Res doctrine): step k of
  * walk w at node v moves to the out-neighbor d minimizing
  * saltedHash32("w:k:d") — a fixed pseudo-random rank a SQL mirror
  * replays exactly, so the whole corpus is hash-oracle-able while still
  * being a uniform-ish draw per (walk, step) (each step re-salts with k,
  * so consecutive steps are independent draws; duplicate edges cannot
  * bias the draw — the min over a set ignores multiplicity).
  *
  * Scale shape: the state is one row per LIVE walk (walks are a bounded
  * panel — seeds × walks-per-seed — never O(E)); each of the `len`
  * rounds is one join of the walk frame against the edge list on the
  * current node plus a per-walk argmin — the [[Routing.bfsHops]] shuffle
  * shape with a fixed round count and NON-GROWING state. Dead-end nodes
  * end their walk early (the join simply drops it). The O(E) side
  * re-joins per round; stage it src-bucketed ([[Routing.stageEdgesTable]])
  * when rounds dominate at cluster scale — same remedy as every
  * frontier loop here.
  */
object Walks {

  /** Walk step rows (walk_id, step, node), step 0 = the seed. `seeds`:
    * (walk_id, node) — walk_id must be unique (one row per walk); a
    * caller wanting W walks per seed replicates seeds with distinct
    * ids, which also de-correlates their draws (the id salts the hash).
    */
  def randomWalks(edges: DataFrame, seeds: DataFrame, len: Int,
                  salt: Int = 0,
                  checkpointDir: Option[String] = None): DataFrame = {
    require(len >= 1, s"len must be >= 1, got $len")
    val spark = edges.sparkSession
    val ckpt = graft.operators.Iteration.materializer(spark, checkpointDir)
    val e = ckpt(edges.select(col("src"), col("dst")))
    var cur = ckpt(seeds.select(col("walk_id"), col("node")))
    val slices = scala.collection.mutable.ListBuffer(
      cur.select(col("walk_id"), lit(0).as("step"), col("node")))
    for (k <- 1 to len) {
      // rank = deterministic draw for (walk, step, candidate); dst
      // tie-break keeps the argmin total even on 32-bit hash collisions
      val rank = graft.functions.text.saltedHash32(
        concat_ws(":", col("walk_id"), lit(k), e("dst")), salt)
      cur = ckpt(cur.join(e, cur("node") === e("src"))
        .groupBy(col("walk_id"))
        .agg(min_by(e("dst"), struct(rank.as("r"), e("dst").as("d")))
          .as("node")))
      slices += cur.select(col("walk_id"), lit(k).as("step"), col("node"))
    }
    slices.reduce(_ unionByName _)
  }

  /** The walks as ordered SEQUENCES (walk_id, nodes array) — the corpus
    * row shape a tokenizer/skip-gram stage consumes. One per-walk sort
    * of ≤ len+1 elements; the array is journey-length bounded (W7/W8
    * ordered-fold doctrine).
    */
  def walkSequences(edges: DataFrame, seeds: DataFrame, len: Int,
                    salt: Int = 0,
                    checkpointDir: Option[String] = None): DataFrame =
    randomWalks(edges, seeds, len, salt, checkpointDir)
      .groupBy(col("walk_id"))
      .agg(transform(
        sort_array(collect_list(struct(col("step"), col("node")))),
        x => x.getField("node")).as("nodes"))

  /** SKIP-GRAM co-occurrence counts over walk sequences — the word2vec
    * training-pair corpus (Mikolov et al. 2013) DeepWalk feeds its
    * walks into: (center, context, n) for every ordered pair of nodes
    * within `window` positions of each other in some sequence (both
    * directions, the symmetric skip-gram convention). Pairs are
    * generated INSIDE each row's array (nested `transform` over
    * forward `slice`s — pure codegen-able HOFs, no self-join, no
    * explode-then-join shuffle): per sequence the blowup is ≤
    * 2·window·len pairs, array-bounded, and the only shuffle is the
    * final (center, context) count — output-sized. `sequences`:
    * (walk_id, nodes array).
    */
  def skipGramCounts(sequences: DataFrame, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    // forward pairs (center at i, context at i+1..i+window); the
    // symmetric direction is the same set swapped
    val fwd = flatten(transform(col("nodes"), (x, i) =>
      transform(slice(col("nodes"), i + lit(2), lit(window)),
        y => struct(x.as("center"), y.as("context")))))
    sequences
      .select(explode(fwd).as("p"))
      .select(col("p.center").as("center"), col("p.context").as("context"))
      .unionAll(sequences
        .select(explode(fwd).as("p"))
        .select(col("p.context").as("center"), col("p.center").as("context")))
      .groupBy(col("center"), col("context"))
      .agg(count(lit(1)).as("n"))
  }
}
