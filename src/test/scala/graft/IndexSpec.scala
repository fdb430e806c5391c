package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Index, Splits}

/** Inverted-index construction (operators.Index) and the
  * weight-proportional sampling predicate (Splits.keepByWeightBp).
  */
class IndexSpec extends SparkTestBase {
  import spark.implicits._

  // Hot term ("x" in every doc, varying tf) + ties (same tf, id breaks)
  // + a singleton term; doc 4 contributes nothing to "x".
  private lazy val docs = Seq(
    (1L, "x x x a b"),
    (2L, "x x a a"),
    (3L, "x x c"),
    (4L, "a c c"),
    (5L, "x rare"),
    (6L, "x x x x")
  ).toDF("doc_id", "text")

  /** The naive single-window form the salted two-phase must equal. */
  private def brute(maxPostings: Int) = {
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col("term"))
      .orderBy(col("tf").desc, col("doc_id"))
    tf.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxPostings)
      .groupBy(col("term"))
      .agg(sort_array(collect_list(concat(col("doc_id").cast("string"),
        lit(":"), col("tf").cast("string")))).as("p"))
  }

  test("salted two-phase top-k equals the single hot window, any salts") {
    for (k <- Seq(1, 2, 3, 10); salts <- Seq(1, 2, 16)) {
      val got = Index.invertedIndex(docs, "doc_id", "text",
          maxPostings = k, salts = salts)
        .select(col("term"), split(col("postings"), ",").as("p"))
        .as[(String, Seq[String])].collect().toMap
        .map { case (t, p) => t -> p.sorted }
      val want = brute(k).as[(String, Seq[String])].collect().toMap
      assert(got == want, s"k=$k salts=$salts")
    }
  }

  test("postings are doc-ordered, capped by impact, df counts ALL docs") {
    val r = Index.invertedIndex(docs, "doc_id", "text",
        maxPostings = 2, salts = 4)
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // "x": df over all 5 docs containing it; cap keeps tf-3 docs 1 and 6
    // (6 has tf 4, 1 has tf 3 — top-2 by tf desc), serialized doc-ordered
    assert(r("x") == ("x", 5L, 2L, "1:3,6:4"))
    assert(r("rare") == ("rare", 1L, 1L, "5:1"))
    // "a": tf 2 in doc 2, tf 1 in docs 1 and 4 — tie breaks on doc id
    assert(r("a") == ("a", 3L, 2L, "1:1,2:2"))
  }

  test("keepByWeightBp: 0 keeps none, 10000 keeps all, monotone in weight") {
    val ids = (1L to 500L).toDF("id")
    def kept(bp: Long): Set[Long] = ids
      .filter(Splits.keepByWeightBp(col("id"), lit(bp), salt = 3))
      .as[Long].collect().toSet
    assert(kept(0).isEmpty)
    assert(kept(10000).size == 500)
    val steps = Seq(1000L, 3000L, 5000L, 9000L).map(kept)
    steps.sliding(2).foreach { case Seq(lo, hi) =>
      assert(lo.subsetOf(hi), "kept sets must nest as the weight rises")
    }
    // ~proportional: 30% weight keeps roughly 30% (md5 is uniform)
    assert(math.abs(kept(3000).size - 150) < 40)
  }

  test("mixToTarget: exact integer rates, binding group whole, drops others") {
    // groups with engineered token totals: a=1000, b=1000, c=500, x=800
    def rows(g: String, n: Int, tok: Long, base: Long) =
      (0 until n).map(i => (base + i, g, tok))
    val df = (rows("a", 100, 10L, 0L) ++ rows("b", 100, 10L, 1000L) ++
      rows("c", 50, 10L, 2000L) ++ rows("x", 80, 10L, 3000L))
      .toDF("id", "g", "tok")
    // targets a=50%, b=30%, c=20% → B = min(1000·1e4/5000, 1000·1e4/3000,
    // 500·1e4/2000) = min(2000, 3333, 2500) = 2000 → a binds:
    // rate(a) = (2000·5000/1e4)·1e4/1000 = 10000
    // rate(b) = (2000·3000/1e4)·1e4/1000 = 6000
    // rate(c) = (2000·2000/1e4)·1e4/500  = 8000
    val got = Splits.mixToTarget(df, "g", "id", "tok",
        Seq("a" -> 5000, "b" -> 3000, "c" -> 2000), salt = 1)
      .as[(Long, String, Long, Long)].collect()
    val rates = got.map(r => r._2 -> r._4).toSet
    assert(rates == Set("a" -> 10000L, "b" -> 6000L, "c" -> 8000L))
    // binding group survives whole; 'x' (no target) is gone entirely
    assert(got.count(_._2 == "a") == 100)
    assert(!got.exists(_._2 == "x"))
    // thinned groups keep ~rate fraction (md5 uniform; generous band)
    val bKept = got.count(_._2 == "b")
    assert(bKept > 35 && bKept < 85, s"b kept $bKept of 100 at 6000 bp")
    // rows kept are exactly the keepByWeightBp draws at the same salt
    val bIds = df.filter(col("g") === "b")
      .filter(Splits.keepByWeightBp(col("id"), lit(6000L), salt = 1))
      .select("id").as[Long].collect().toSet
    assert(got.filter(_._2 == "b").map(_._1).toSet == bIds)
  }
}
