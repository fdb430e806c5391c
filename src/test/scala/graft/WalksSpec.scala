package graft

import org.apache.spark.sql.functions._
import graft.graph.Walks

/** Random-walk corpus generation: deterministic-draw replay, dead-end
  * termination, panel independence, sequence shape.
  */
class WalksSpec extends SparkTestBase {
  import spark.implicits._

  private val edges = Seq(
    ("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "a"),
    ("d", "d") // self-loop: a walk reaching d stays at d
  ).toDF("src", "dst")

  /** Serial replay of the exact draw rule. */
  private def serialWalk(adj: Map[String, Seq[String]], wid: String,
                         seed: String, len: Int): Seq[(Int, String)] = {
    val out = scala.collection.mutable.ListBuffer(0 -> seed)
    var cur = seed
    var k = 1
    var alive = true
    while (k <= len && alive) {
      adj.get(cur) match {
        case Some(ns) if ns.nonEmpty =>
          cur = ns.minBy(d =>
            (graft.functions.text.saltedHash32Long(s"$wid:$k:$d", 0), d))
          out += k -> cur
          k += 1
        case _ => alive = false
      }
    }
    out.toSeq
  }

  test("randomWalks equals a serial replay of the deterministic draw") {
    val adj = Seq("a" -> Seq("b", "c"), "b" -> Seq("c", "d"),
      "c" -> Seq("a"), "d" -> Seq("d")).toMap
    val seeds = Seq(("w1", "a"), ("w2", "b"), ("w3", "c"))
      .toDF("walk_id", "node")
    val got = Walks.randomWalks(edges, seeds, len = 6)
      .as[(String, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).sortBy(_._1)
        .toSeq).toMap
    for ((wid, seed) <- Seq("w1" -> "a", "w2" -> "b", "w3" -> "c"))
      assert(got(wid) == serialWalk(adj, wid, seed, 6),
        s"$wid diverged: ${got(wid)}")
    // every walk ran the full 6 steps (this graph has no dead ends)
    assert(got.values.forall(_.size == 7))
  }

  test("dead ends stop a walk early; others continue") {
    val e = Seq(("a", "b"), ("b", "z"), ("a", "a")).toDF("src", "dst")
    // z has no out-edge: any walk reaching z ends there
    val seeds = Seq(("w1", "b")).toDF("walk_id", "node")
    val got = Walks.randomWalks(e, seeds, len = 5)
      .as[(String, Int, String)].collect().sortBy(_._2).toSeq
    assert(got == Seq(("w1", 0, "b"), ("w1", 1, "z")))
  }

  test("two walks from the same seed de-correlate (id salts the draw)") {
    val seeds = Seq(("p1", "a"), ("p2", "a"), ("p3", "a"), ("p4", "a"))
      .toDF("walk_id", "node")
    val seqs = Walks.walkSequences(edges, seeds, len = 8)
      .as[(String, Seq[String])].collect().toMap
    assert(seqs.size == 4 && seqs.values.forall(_.head == "a"))
    // at least two of the four 8-step walks differ — a constant draw
    // (salt ignored) would make them identical
    assert(seqs.values.toSeq.distinct.size >= 2, seqs.toString)
  }

  test("skipGramCounts: hand-computed window-2 pairs, symmetric, " +
    "counted across sequences") {
    val seqs = Seq(("w1", Seq("a", "b", "c", "d")), ("w2", Seq("a", "b")))
      .toDF("walk_id", "nodes")
    val got = Walks.skipGramCounts(seqs, window = 2)
      .as[(String, String, Long)].collect().toSet
    // w1 forward: (a,b)(a,c)(b,c)(b,d)(c,d); w2 adds (a,b); symmetric
    val w1f = Seq("a" -> "b", "a" -> "c", "b" -> "c", "b" -> "d",
      "c" -> "d")
    val want = (w1f ++ Seq("a" -> "b")) // counts per direction
      .flatMap { case (x, y) => Seq((x, y), (y, x)) }
      .groupBy(identity).map { case ((x, y), v) => (x, y, v.size.toLong) }
      .toSet
    assert(got == want, s"got=$got")
  }

  test("duplicate edges do not bias the draw (min over a set)") {
    val dup = edges.unionAll(edges).unionAll(edges)
    val seeds = Seq(("w1", "a"), ("w2", "b")).toDF("walk_id", "node")
    val a = Walks.randomWalks(edges, seeds, 6)
      .as[(String, Int, String)].collect().toSet
    val b = Walks.randomWalks(dup, seeds, 6)
      .as[(String, Int, String)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
