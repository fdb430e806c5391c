package graft

import org.apache.spark.sql.functions._
import graft.operators.Cep

/** CEP pattern matching (operators/Cep): sequence construction is a
  * TOTAL (ts, tie) order, counts are non-overlapping leftmost matches,
  * and the result is partition-invariant. The full operator is oracled
  * end-to-end by e18 (DuckDB string_agg + regexp_extract_all mirror).
  */
class CepSpec extends SparkTestBase {
  import spark.implicits._

  private val ev = Seq(
    // user 1: v c e p v p  — "v[ce]*p" matches twice (vcep, vp),
    //                        "e{2,}" never, "s[^p]*p" never
    (1L, 1L, 10L, "v"), (1L, 2L, 20L, "c"), (1L, 3L, 30L, "e"),
    (1L, 4L, 40L, "p"), (1L, 5L, 50L, "v"), (1L, 6L, 60L, "p"),
    // user 2: s e e e p — "e{2,}" once (eee, non-overlapping),
    //                     "s[^p]*p" once, "v[ce]*p" never
    (2L, 1L, 10L, "s"), (2L, 2L, 20L, "e"), (2L, 3L, 30L, "e"),
    (2L, 4L, 40L, "e"), (2L, 5L, 50L, "p")
  ).toDF("user_id", "tie", "ts", "sym")

  test("sequences: total (ts, tie) order, ties broken by the tiebreak") {
    // same ts for both rows of user 3 — tie column must decide
    val tied = Seq((3L, 2L, 10L, "b"), (3L, 1L, 10L, "a"))
      .toDF("user_id", "tie", "ts", "sym")
    val s = Cep.sequences(tied, "user_id", "ts", "tie", col("sym"))
      .as[(Long, String)].collect().toMap
    assert(s(3L) == "ab")
  }

  test("patternCounts: hand-computed non-overlapping counts") {
    val got = Cep.patternCounts(ev, "user_id", "ts", "tie", col("sym"),
        Seq("e{2,}", "s[^p]*p", "v[ce]*p"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("e{2,}") == ((1L, 1L)))
    assert(got("s[^p]*p") == ((1L, 1L)))
    assert(got("v[ce]*p") == ((1L, 2L)))
  }

  test("patternCounts is partition-invariant") {
    val want = Cep.patternCounts(ev, "user_id", "ts", "tie", col("sym"),
      Seq("vp", "e+")).collect().map(_.toSeq).toSeq
    for (p <- Seq(1, 7)) {
      val got = Cep.patternCounts(ev.repartition(p), "user_id", "ts",
        "tie", col("sym"), Seq("vp", "e+")).collect().map(_.toSeq).toSeq
      assert(got == want, s"parts=$p")
    }
  }

  test("maxEventsPerKey caps the per-key state explicitly") {
    val s = Cep.sequences(ev, "user_id", "ts", "tie", col("sym"),
        maxEventsPerKey = 3)
      .as[(Long, String)].collect().toMap
    assert(s(1L) == "vce" && s(2L) == "see")
  }
}
