package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Asymmetric containment pairs (Dedup.containmentPairs): the quote-
  * detection semantics Jaccard can't see, the direction asymmetry, and
  * the maxDf guard's provable-subset property. Oracled end-to-end by
  * d21 (DuckDB mirror of the same prefix construction).
  */
class ContainmentSpec extends SparkTestBase {
  import spark.implicits._

  // doc 2 is a verbatim excerpt of doc 1; doc 3 is unrelated filler of
  // similar length; doc 4 shares only the ubiquitous filler word "the"
  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "gamma delta epsilon zeta"),
    (3L, "one two three four five six seven eight nine ten"),
    (4L, "the the the")
  ).toDF("doc_id", "text")

  private def pairs(theta: (Int, Int), maxDf: Option[Long] = None) =
    Dedup.containmentPairs(docs, "doc_id", "text",
        thetaNum = theta._1, thetaDen = theta._2, shingleN = 1,
        maxDf = maxDf)
      .as[(Long, Long, Double)].collect().toSet

  test("a verbatim excerpt is contained in its source, not vice versa") {
    val got = pairs((4, 5))
    // C(2→1) = 4/4 = 1.0; C(1→2) = 4/10 < 0.8 — direction matters
    assert(got.contains((2L, 1L, 1.0)))
    assert(!got.exists(p => p._1 == 1L && p._2 == 2L))
    // Jaccard for the same pair is 4/10 — the d09 operator at θ=4/5
    // would never emit it; that asymmetry is the operator's reason
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("identical sets emit BOTH directions at containment 1.0") {
    val two = Seq((1L, "a b c"), (2L, "c b a")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(two, "doc_id", "text",
        thetaNum = 1, thetaDen = 1, shingleN = 1)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 1.0), (2L, 1L, 1.0)))
  }

  test("maxDf output is a subset of exact; surviving pairs keep EXACT " +
    "containment values") {
    val exact = pairs((3, 5))
    for (cap <- Seq(1L, 2L, 3L, 100L)) {
      val capped = pairs((3, 5), maxDf = Some(cap))
      assert(capped.subsetOf(exact), s"cap=$cap not a subset")
    }
    // a generous cap excludes nothing on this fixture
    assert(pairs((3, 5), maxDf = Some(100L)) == exact)
  }

  test("result is partition-invariant") {
    val want = pairs((3, 5))
    val got = Dedup.containmentPairs(docs.repartition(7), "doc_id",
        "text", thetaNum = 3, thetaDen = 5, shingleN = 1)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == want)
  }
}
