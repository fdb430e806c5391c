package graft

import graft.operators.Anonymize
import org.apache.spark.sql.functions._

class AnonymizeSpec extends SparkTestBase {
  import spark.implicits._

  // (city, age) microdata: city-level groups are small, region-level
  // groups are big enough at k=3 except one residue row
  private lazy val micro = Seq(
    ("bdg", "west", 23), ("bdg", "west", 24), ("bdg", "west", 31),
    ("jkt", "west", 29), ("jkt", "west", 33),
    ("sby", "east", 41), ("sby", "east", 45), ("sby", "east", 52),
    ("mlg", "east", 38),
    ("mdn", "north", 27)).toDF("city", "region", "age")

  private val ladder = Seq(
    Seq(col("city"), (col("age") - col("age") % 10).cast("string")),
    Seq(col("region"), (col("age") - col("age") % 10).cast("string")),
    Seq(col("region"), lit("*")),
    Seq(lit("*"), lit("*")))
  private val names = Seq("place", "age_band")

  test("levelStats: one pass, per-level under-k rows and group counts") {
    val got = Anonymize.levelStats(micro, ladder, k = 3)
      .orderBy("lvl").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // level 3: one group of 10, nothing suppressed
    assert(got.length == 4 && got(3) == ((3, 0L, 1L)))
    // level 2: west=5, east=4, north=1 → 1 row under k, 3 groups
    assert(got(2) == ((2, 1L, 3L)))
    // level 0: every (city, decade) group is under 3
    assert(got(0)._2 == 10L)
  }

  test("chooseLevel: finest level within the suppression budget; " +
    "coarsest as the fallback") {
    // 20% budget → level 2 qualifies first (1/10 suppressed)
    assert(Anonymize.chooseLevel(micro, ladder, k = 3, 0.2) == 2)
    // zero budget → only level 3 has no residue
    assert(Anonymize.chooseLevel(micro, ladder, k = 3, 0.0) == 3)
    // k larger than the table → nothing qualifies → coarsest, not a crash
    assert(Anonymize.chooseLevel(micro, ladder, k = 99, 0.0) == 3)
  }

  test("kAnonymousGroups: under-k residue collapses into the '*' row") {
    val got = Anonymize.kAnonymousGroups(micro, ladder, names, k = 3, 0.2)
      .orderBy("place", "age_band").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq == Seq(
      ("*", "*", 1L, 2), ("east", "*", 4L, 2), ("west", "*", 5L, 2)))
  }

  test("kAnonymize: every released non-'*' group has >= k rows, " +
    "and row count is preserved") {
    val rel = Anonymize.kAnonymize(micro, ladder, names, k = 3, 0.2)
    assert(rel.count() == 10)
    // safe-by-default: NO raw input column rides into the release
    assert(rel.columns.toSeq == Seq("place", "age_band", "lvl"))
    // carry is explicit, and the raw QI sources stay out unless named
    val withAge = Anonymize.kAnonymize(micro, ladder, names, k = 3, 0.2,
      carry = Seq("age"))
    assert(withAge.columns.toSeq == Seq("age", "place", "age_band", "lvl"))
    val bad = rel.filter(col("place") =!= "*")
      .groupBy("place", "age_band").count()
      .filter(col("count") < 3)
    assert(bad.isEmpty)
    // suppressed rows are '*' on EVERY QI column
    assert(rel.filter(col("place") === "*" && col("age_band") =!= "*")
      .isEmpty)
  }

  test("struct QI keys: adversarial values cannot collide two distinct " +
    "tuples into one k-count (the concat-separator attack)") {
    // ("ab", "c") and ("a", "bc") concat to the same string
    // under a separator-joined key; as struct keys they are distinct
    // groups of 1 and must BOTH suppress at k=2
    val evil = Seq(("ab", "c", 1), ("a", "bc", 2))
      .toDF("city", "region", "age")
    val oneLevel = Seq(Seq(col("city"), col("region")))
    val rel = Anonymize.kAnonymize(evil, oneLevel,
      Seq("qa", "qb"), k = 2, maxSuppressedFrac = 1.0)
    assert(rel.filter(col("qa") =!= "*" || col("qb") =!= "*").isEmpty,
      "both singleton groups must suppress — a merged count of 2 " +
        "would leak them")
  }

  test("monotonicity: raising k never picks a finer level") {
    val lv = (1 to 6).map(k =>
      Anonymize.chooseLevel(micro, ladder, k = k, 0.2))
    assert(lv == lv.sorted)
  }

  test("property: k-anonymity holds on a random table across k") {
    val rnd = new scala.util.Random(19)
    val rows = Seq.fill(200)((s"c${rnd.nextInt(12)}", s"r${rnd.nextInt(4)}",
      18 + rnd.nextInt(60))).toDF("city", "region", "age")
    for (k <- Seq(2L, 5L, 11L)) {
      val rel = Anonymize.kAnonymize(rows, ladder, names, k, 0.05)
      val bad = rel.filter(col("place") =!= "*")
        .groupBy("place", "age_band").count()
        .filter(col("count") < k)
      assert(bad.isEmpty, s"k=$k violated")
      assert(rel.count() == 200, s"k=$k lost rows")
    }
  }
}
