package graft

import graft.operators.Hierarchy

/** Level-synchronous subtree aggregation (operators/Hierarchy): exact
  * bottom-up convergence, the fixpoint no-op property the round-budget
  * contract rests on, and partition invariance. Oracled end-to-end by
  * q21 (DuckDB recursive-CTE closure mirror).
  */
class HierarchySpec extends SparkTestBase {
  import spark.implicits._

  //        1(10)
  //       /     \
  //    2(20)    3(30)
  //    /  \
  // 4(40) 5(50)      6(60) is a second root (forest, not tree)
  private lazy val forest = Seq(
    (1L, Option.empty[Long], 10L), (2L, Some(1L), 20L),
    (3L, Some(1L), 30L), (4L, Some(2L), 40L), (5L, Some(2L), 50L),
    (6L, Option.empty[Long], 60L)
  ).toDF("k", "parent", "v")

  private def run(rounds: Int) =
    Hierarchy.subtreeAggregate(forest, "k", "parent", "v", rounds)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap

  test("hand-computed subtree totals and descendant counts") {
    val got = run(rounds = 2) // forest height = 2
    assert(got == Map(
      1L -> ((150L, 4L)), 2L -> ((110L, 2L)), 3L -> ((30L, 0L)),
      4L -> ((40L, 0L)), 5L -> ((50L, 0L)), 6L -> ((60L, 0L))))
  }

  test("extra rounds past the height are a fixpoint no-op") {
    assert(run(2) == run(5))
  }

  test("too few rounds under-reports exactly the not-yet-converged " +
    "depths (the bound is real, not decorative)") {
    val r1 = run(1)
    // height-1 nodes are exact after 1 round; the root (height 2) has
    // only its children's round-0 (own-value) totals so far
    assert(r1(2L) == ((110L, 2L)) && r1(3L) == ((30L, 0L)))
    assert(r1(1L) == ((60L, 2L))) // 10 + 20 + 30, grandchildren missing
  }

  test("the loop stops at the MEASURED height, not the rounds bound") {
    // forest height = 2 → rounds 1..2 improve, round 3 verifies the
    // fixpoint and stops; a bound of 50 must not run 50 rounds
    val (df, ran) = Hierarchy.subtreeAggregateCounted(forest, "k",
      "parent", "v", rounds = 50)
    assert(ran == 3, s"expected 3 rounds (height 2 + fixpoint probe), ran $ran")
    val got = df.as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == run(2))
    // an all-roots forest (height 0) stops after one verify round
    val flat = Seq((1L, Option.empty[Long], 5L), (2L, Option.empty[Long], 7L))
      .toDF("k", "parent", "v")
    val (_, ranFlat) = Hierarchy.subtreeAggregateCounted(flat, "k",
      "parent", "v", rounds = 50)
    assert(ranFlat == 1, s"all-roots forest ran $ranFlat rounds")
  }

  test("result is partition-invariant") {
    val want = run(3)
    val got = Hierarchy.subtreeAggregate(forest.repartition(7), "k",
        "parent", "v", 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got == want)
  }
}
