package graft

import org.apache.spark.sql.functions._
import graft.graph.Projection

/** Bipartite projection: weights, multiplicity dedup, and the hub cap. */
class ProjectionSpec extends SparkTestBase {
  import spark.implicits._

  test("co-membership weights count distinct shared left nodes") {
    // l1: {a,b,c}, l2: {a,b}, l3: {c} → (a,b)=2, (a,c)=1, (b,c)=1
    val e = Seq((1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (3L, "c")).toDF("l", "r")
    val got = Projection.bipartiteProject(e, "l", "r", maxDeg = 10)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 2L), ("a", "c", 1L), ("b", "c", 1L)))
  }

  test("duplicate memberships never inflate a weight") {
    val e = Seq((1L, "a"), (1L, "a"), (1L, "b"), (1L, "b"))
      .toDF("l", "r")
    val got = Projection.bipartiteProject(e, "l", "r", maxDeg = 10)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 1L)))
  }

  test("the hub cap drops over-degree left nodes entirely") {
    val hub = (1 to 5).map(i => (9L, s"r$i")) // degree 5 hub
    val e = (Seq((1L, "r1"), (1L, "r2")) ++ hub).toDF("l", "r")
    val got = Projection.bipartiteProject(e, "l", "r", maxDeg = 4)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("r1", "r2", 1L))) // hub contributed nothing
    // with the cap relaxed the hub's pairs appear
    val all = Projection.bipartiteProject(e, "l", "r", maxDeg = 5)
    assert(all.count() == 10L) // C(5,2) from the hub; (r1,r2) merges
  }

  test("32-bit right ids take the packed-pair path and equal the " +
    "generic path, negatives included") {
    // same co-memberships under int and string right ids; the int path
    // packs (r1, r2) into one long for the aggregation and must unpack
    // losslessly — including sign bits (negative ids)
    val ids = Seq(5, -7, Int.MaxValue, Int.MinValue + 3, 0, 42)
    val e = (for { l <- 1 to 6; i <- 0 until l }
      yield (l.toLong, ids(i))).toDF("l", "r")
    val eStr = e.select(col("l"), format_string("%011d", col("r")).as("r"))
    val gotInt = Projection.bipartiteProject(e, "l", "r", maxDeg = 6)
      .select(format_string("%011d", col("r1")),
        format_string("%011d", col("r2")), col("weight"))
      .as[(String, String, Long)].collect().toSet
    val gotStr = Projection.bipartiteProject(eStr, "l", "r", maxDeg = 6)
      .as[(String, String, Long)].collect().toSet
    // format_string %011d zero-pads to fixed width, so string order ==
    // numeric order only for non-negatives; compare as unordered pair
    // sets with weights instead
    def canon(s: Set[(String, String, Long)]) =
      s.map { case (a, b, w) => (Set(a, b), w) }
    assert(canon(gotInt) == canon(gotStr) && gotInt.nonEmpty)
    // the packed output really is int-typed (the input's dtype)
    assert(Projection.bipartiteProject(e, "l", "r", maxDeg = 6)
      .schema("r1").dataType == org.apache.spark.sql.types.IntegerType)
  }

  test("plan pin: exactly two hash exchanges — the raw edge exchange " +
    "in, the pair aggregation out") {
    // the Projection doc's exchange-economics claim: dedup, degree
    // window, and the per-left set all ride the one hash(__l) layout
    // (subset rule), and the pair generation is an explode, not a join
    val e = (1 to 200).map(i => (i.toLong % 37, s"r${i % 11}")).toDF("l", "r")
    val plan = Projection.bipartiteProject(e, "l", "r", maxDeg = 11)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    val n = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(n == 2, s"want 2 exchanges, got $n:\n$plan")
    assert(!plan.contains("Join"), s"pair generation regressed to a join:\n$plan")
  }
}
