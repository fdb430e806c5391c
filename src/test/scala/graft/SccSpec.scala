package graft

import graft.graph.Scc
import org.apache.spark.sql.functions._

class SccSpec extends SparkTestBase {
  import spark.implicits._

  /** Brute-force SCC by transitive closure over an in-memory edge list:
    * scc(v) = min{u : u →* v and v →* u} (reflexive).
    */
  private def bruteScc(edges: Seq[(String, String)]): Map[String, String] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    def reach(start: String): Set[String] = {
      var seen = Set(start)
      var frontier = Set(start)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- seen
        seen ++= next
        frontier = next
      }
      seen
    }
    val fwd = nodes.map(n => n -> reach(n)).toMap
    nodes.map { v =>
      v -> nodes.filter(u => fwd(v).contains(u) && fwd(u).contains(v)).min
    }.toMap
  }

  private def run(edges: Seq[(String, String)]): Map[String, String] =
    Scc.scc(edges.toDF("src", "dst"), prePartitionEdges = false)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("scc: hand graph — two cycles, a bridge, a tail, an isolate") {
    // cycle {a,b,c}; cycle {d,e}; bridge c->d; tail f->a; isolate via g->h
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a",
      "d" -> "e", "e" -> "d", "c" -> "d", "f" -> "a", "g" -> "h")
    val got = run(edges)
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "d" -> "d", "e" -> "d", "f" -> "f", "g" -> "g", "h" -> "h"))
  }

  test("scc: nested structure — SCC inside a larger weak component") {
    // {b,c,d} strongly connected; a feeds in, e drains out, back-edge
    // e->f->e forms a second SCC downstream
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "b",
      "d" -> "e", "e" -> "f", "f" -> "e")
    val got = run(edges)
    assert(got == Map("a" -> "a", "b" -> "b", "c" -> "b", "d" -> "b",
      "e" -> "e", "f" -> "e"))
  }

  test("scc: equals brute-force transitive closure on a random digraph") {
    val rnd = new scala.util.Random(13)
    val n = 40
    val edges = Seq.fill(90)(
      (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}")).filter(e => e._1 != e._2)
    assert(run(edges) == bruteScc(edges))
  }

  test("scc: a single long cycle is one component") {
    val n = 12
    val edges = (0 until n).map(i => (f"c$i%02d", f"c${(i + 1) % n}%02d"))
    val got = run(edges)
    assert(got.values.toSet == Set("c00") && got.size == n)
  }

  test("condensation: SCC-level DAG edges, self-loops collapsed") {
    val edges = Seq("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "d",
      "d" -> "c", "d" -> "a")
    // {a,b} and {c,d} are each SCCs... unless d->a closes the loop:
    // a->b->c->d->a makes ALL of a,b,c,d one SCC. Use a true DAG-of-SCCs.
    val e2 = Seq("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "d", "d" -> "c")
    val df = e2.toDF("src", "dst")
    val labels = Scc.scc(df, prePartitionEdges = false)
    val cond = Scc.condensation(df, labels)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(cond == Set("a" -> "c"))
    // and the first graph really is one SCC (sanity of the comment above)
    assert(run(edges).values.toSet == Set("a"))
  }

  test("truncated color fixpoint NEVER settles wrong labels — the " +
    "sound prefix is returned, not a split SCC") {
    // a 12-cycle needs ~12 color rounds; cap at 4: pre-fix the root
    // settled as a singleton (splitting the SCC); post-fix the round
    // aborts and the cycle's nodes are honestly ABSENT from the output
    val n = 12
    val edges = (0 until n).map(i => (f"c$i%02d", f"c${(i + 1) % n}%02d"))
    val got = Scc.scc(edges.toDF("src", "dst"), maxColorRounds = 4,
        warnOnTruncation = false, prePartitionEdges = false)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val correct = bruteScc(edges)
    assert(got.forall { case (node, scc) => correct(node) == scc },
      "every emitted label must be correct even under truncation")
    // and with enough rounds the full answer comes back
    val full = run(edges)
    assert(full == correct)
  }

  test("dagLayers: diamond with a long arm — layer is the LONGEST path") {
    // a->b->c->e and a->d->e: e's layer is 3 (via the long arm), not 2
    val dag = Seq("a" -> "b", "b" -> "c", "c" -> "e", "a" -> "d",
      "d" -> "e").toDF("src", "dst")
    val got = Scc.dagLayers(dag).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("a" -> 0, "b" -> 1, "c" -> 2, "d" -> 1, "e" -> 3))
  }

  test("dagLayers: equals brute-force longest path on a random DAG") {
    val rnd = new scala.util.Random(7)
    // random DAG: edges only from lower to higher index
    val edges = Seq.fill(60) {
      val i = rnd.nextInt(19); val j = i + 1 + rnd.nextInt(19 - i)
      (f"n$i%02d", f"n$j%02d")
    }.distinct
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val incoming = edges.groupBy(_._2)
      .map { case (d, es) => d -> es.map(_._1) }
    def depth(v: String): Int = incoming.get(v) match {
      case Some(ps) => 1 + ps.map(depth).max
      case None     => 0
    }
    val want = nodes.map(v => v -> depth(v)).toMap
    val got = Scc.dagLayers(edges.toDF("src", "dst")).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == want)
  }
}
