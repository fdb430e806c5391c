package graft

import org.apache.spark.sql.functions._
import graft.operators.{Contamination, Splits}

/** Corpus-hygiene operators: benchmark decontamination (n-gram leak
  * detection), repetition signals, and deterministic stratified sampling.
  */
class ContaminationSpec extends SparkTestBase {
  import spark.implicits._

  test("contaminatedDocs flags exactly the docs sharing an n-gram") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      // contains "alpha beta gamma" (and "beta gamma delta") verbatim
      (1L, "prefix alpha beta gamma delta suffix"),
      // same words, order broken — no shared 3-gram
      (2L, "beta alpha delta gamma words"),
      // clean
      (3L, "completely unrelated sentence here")
    ).toDF("doc_id", "text")
    val got = Contamination.contaminatedDocs(corpus, bench, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L))
    // bench 3-grams: {alpha beta gamma, beta gamma delta} — doc 1 has both
    assert(got(0).getAs[Long]("n_hit_grams") == 2L)
  }

  test("contaminatedDocs counts DISTINCT leaked grams (repeats in doc = 1)") {
    val bench = Seq((100L, "alpha beta gamma")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma and alpha beta gamma again")).toDF("doc_id", "text")
    val got = Contamination.contaminatedDocs(corpus, bench, "doc_id", "text", 3)
      .collect()
    assert(got.length == 1 && got(0).getAs[Long]("n_hit_grams") == 1L)
  }

  test("contaminatedDocs matches brute force on real documents (8-grams)") {
    val docs = Tables(spark, sfSmoke).documents
    val bench = docs.filter(col("doc_id") % 10 === 7)
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val got = Contamination.contaminatedDocs(corpus, bench, "doc_id", "text", 8)
      .orderBy("doc_id")
      .as[(Long, Long)].collect().toSeq

    // independent fold: distinct 8-gram sets per doc via plain Scala
    def grams(text: String): Set[String] = {
      val toks = text.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .replaceAll(" +", " ").trim.split(" ").filter(_.nonEmpty)
      if (toks.length < 8) Set.empty
      else toks.sliding(8).map(_.mkString(" ")).toSet
    }
    val all = docs.select("doc_id", "text").as[(Long, String)].collect()
    val benchGrams = all.filter(_._1 % 10 == 7).flatMap(d => grams(d._2)).toSet
    val expect = all.filter(_._1 % 10 != 7)
      .map { case (id, t) => id -> grams(t).count(benchGrams.contains).toLong }
      .filter(_._2 > 0).sortBy(_._1).toSeq
    assert(got == expect)
  }

  test("fuzzyContaminatedDocs cuts exactly at the integer threshold") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    // bench 3-gram set size lb = 3
    val corpus = Seq(
      // shares all 3 grams: jaccard 3/3 = 1
      (1L, "alpha beta gamma delta epsilon"),
      // grams: {alpha beta gamma, beta gamma zeta, gamma zeta eta} →
      // inter 1, union 5 → jaccard exactly 1/5: kept at theta = 1/5
      (2L, "alpha beta gamma zeta eta"),
      // inter 1, la 4 → union 6 → 1/6 < 1/5: dropped
      (3L, "alpha beta gamma zeta eta theta"),
      // order broken — no shared 3-gram, no candidate row at all
      (4L, "beta alpha delta gamma epsilon words")
    ).toDF("doc_id", "text")
    val got = Contamination.fuzzyContaminatedDocs(
        corpus, bench, "doc_id", "text", n = 3, thetaNum = 1, thetaDen = 5)
      .orderBy("a")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 100L, 1.0), (2L, 100L, 0.2)))
  }

  test("fuzzyContaminatedDocs matches brute force on real documents") {
    val docs = Tables(spark, sfSmoke).documents
    val got = Contamination.fuzzyContaminatedDocs(
        docs.filter(col("doc_id") % 10 =!= 7),
        docs.filter(col("doc_id") % 10 === 7),
        "doc_id", "text", n = 3, thetaNum = 1, thetaDen = 5)
      .orderBy("a", "b")
      .as[(Long, Long, Double)].collect().toSeq

    def grams(text: String): Set[String] = {
      val toks = text.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .replaceAll(" +", " ").trim.split(" ").filter(_.nonEmpty)
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val all = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> grams(t) }
    val expect = (for {
      (a, ga) <- all if a % 10 != 7 && ga.nonEmpty
      (b, gb) <- all if b % 10 == 7 && gb.nonEmpty
      inter = (ga intersect gb).size
      union = ga.size + gb.size - inter
      if inter * 5 >= union
    } yield (a, b,
      BigDecimal(inter.toDouble / union)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy(p => (p._1, p._2)).toSeq
    assert(got == expect)
  }

  test("repetitionStats computes dup_ratio and top_share exactly") {
    // 3-grams of "a b a b a b a": (a b a)x3? positions: [a b a],[b a b],
    // [a b a],[b a b],[a b a] → total 5, distinct 2, top count 3
    val docs = Seq((1L, "a b a b a b a")).toDF("doc_id", "text")
    val r = Contamination.repetitionStats(docs, "doc_id", "text", 3).collect()(0)
    assert(r.getAs[Long]("n_grams") == 5L)
    assert(r.getAs[Long]("n_distinct") == 2L)
    assert(r.getAs[Double]("dup_ratio") == 0.6)   // 1 - 2/5
    assert(r.getAs[Double]("top_share") == 0.6)   // 3/5
  }

  test("ShingleStats kernel equals the exploded long form on real documents") {
    val docs = Tables(spark, sfSmoke).documents
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    val kernel = rows(Contamination.repetitionStats(docs, "doc_id", "text", 3))
    val long = rows(Contamination.repetitionStatsExploded(docs, "doc_id", "text", 3))
    assert(kernel.nonEmpty && kernel == long)
  }

  test("capTokensPerGroup admits greedily in bucket order, keeps the crossing row") {
    // one group; admission order is (md5 bucket, id) — compute it the
    // same way the operator does, then check the greedy prefix
    val df = Seq((1L, "g", 40L), (2L, "g", 40L), (3L, "g", 40L),
      (4L, "g", 40L), (5L, "g", 40L)).toDF("id", "grp", "tok")
    val kept = Splits.capTokensPerGroup(df, "grp", "id", "tok",
        budget = 100L, salt = 5)
      .select("id").as[Long].collect().toSet
    val order = df.select(col("id"),
        Splits.pctBucket(col("id"), 5).as("b"))
      .as[(Long, Long)].collect().sortBy(identity).sortBy(_._2).map(_._1)
    // greedy: 40 + 40 admitted under 100, third crosses (cum-before 80 < 100) → kept, fourth dropped
    assert(kept == order.take(3).toSet)

    // every non-empty group contributes at least one row even when a
    // single row exceeds the budget
    val big = Seq((1L, "g", 999L)).toDF("id", "grp", "tok")
    assert(Splits.capTokensPerGroup(big, "grp", "id", "tok", 10L).count() == 1)

    // the __cum temp column must not silently clobber a caller column
    val clash = Seq((1L, "g", 5L, 0L)).toDF("id", "grp", "tok", "__cum")
    assertThrows[IllegalArgumentException](
      Splits.capTokensPerGroup(clash, "grp", "id", "tok", 10L))
  }

  test("capTokensPerGroupAuto equals the exact pass, scans O(budget) rows") {
    spark.conf.set("spark.graft.debug.validate", "true")
    try {
      // one dwarfing group (5000 rows × 10 tokens = 100× the budget) next
      // to a small group that fits — the mixture shape auto mode exists for
      val rows = (1L to 5000L).map(i => (i, "web", 10L)) ++
        (9001L to 9030L).map(i => (i, "curated", 10L))
      val df = rows.toDF("id", "grp", "tok")
      val budget = 500L
      def keyOf(r: org.apache.spark.sql.Row) = (r.getString(1), r.getLong(0))
      val exact = Splits.capTokensPerGroup(df, "grp", "id", "tok", budget)
        .collect().map(keyOf).toSet
      val auto = Splits.capTokensPerGroupAuto(df, "grp", "id", "tok", budget)
        .collect().map(keyOf).toSet
      assert(auto == exact, "auto mode diverged from the exact greedy pass")
      assert(exact.count(_._1 == "web") >= 50 &&
        exact.count(_._1 == "curated") == 30)

      // the mechanism: with slack 1.5 the dwarfing group's derived keep
      // rate is ceil(100·1.5·500/50000) = 2%, so the ordered window scans
      // ~2% of the group (O(budget) tokens), not all 5000 rows
      val scanned = df.filter(col("grp") === "web" &&
        Splits.pctBucket(col("id")) < 2).count()
      assert(scanned <= 250, s"thinned prefix scanned $scanned rows")
      assert(scanned * 10L >= budget, "prefix must still cover the budget")
    } finally spark.conf.unset("spark.graft.debug.validate")
  }

  test("stratifiedKeep is a deterministic per-row predicate (partition-proof)") {
    val docs = Tables(spark, sfSmoke).documents
    def kept(df: org.apache.spark.sql.DataFrame): Set[Long] = df
      .filter(Splits.stratifiedKeep(col("doc_id"), col("lang"),
        Seq("en" -> 20, "de" -> 60), defaultPct = 90, salt = 4))
      .select("doc_id").as[Long].collect().toSet
    val a = kept(docs)
    val b = kept(docs.repartition(17, col("lang")))
    assert(a == b && a.nonEmpty)
    // the en stratum must actually be downsampled harder than the rest
    val langOf = docs.select("doc_id", "lang").as[(Long, String)]
      .collect().toMap
    val en = langOf.count(_._2 == "en")
    val enKept = a.count(id => langOf(id) == "en")
    assert(enKept < en / 2)
  }

  test("scrubFrequentSpans: serial parity, overlap union, full-scrub row") {
    import graft.operators.Contamination
    // docs 1 and 2 share "alpha beta gamma delta" (df=2 → scrubbed);
    // doc 2 also overlaps it with "gamma delta alpha beta" via doc 3 —
    // covered positions are the UNION of occurrences; doc 4 is ENTIRELY
    // one frequent gram (comes back empty); doc 5 shares nothing
    val docs = Seq(
      (1L, "alpha beta gamma delta keep one"),
      (2L, "x alpha beta gamma delta alpha beta tail"),
      (3L, "y gamma delta alpha beta z"),
      (4L, "alpha beta gamma delta"),
      (5L, "totally unrelated words here")).toDF("doc_id", "text")
    val got = Contamination
      .scrubFrequentSpans(docs, "doc_id", "text", n = 4, minDf = 2)
      .orderBy("doc_id")
      .as[(Long, String, Long)].collect().toSeq
    // serial reference
    val toks = Seq(
      1L -> "alpha beta gamma delta keep one",
      2L -> "x alpha beta gamma delta alpha beta tail",
      3L -> "y gamma delta alpha beta z",
      4L -> "alpha beta gamma delta",
      5L -> "totally unrelated words here")
      .map { case (id, t) => id -> t.split(" ").toSeq }
    val gramsOf = toks.map { case (id, w) =>
      id -> (0 to w.size - 4).map(i => (i, w.slice(i, i + 4).mkString(" ")))
    }
    val df = gramsOf.flatMap { case (id, gs) => gs.map(g => (g._2, id)) }
      .distinct.groupBy(_._1).map { case (g, xs) => g -> xs.size }
    val want = toks.map { case (id, w) =>
      val cov = gramsOf.toMap.apply(id)
        .filter(g => df(g._2) >= 2)
        .flatMap(g => g._1 until g._1 + 4).toSet
      val kept = w.zipWithIndex.collect { case (t, i) if !cov(i) => t }
      (id, kept.mkString(" "), kept.size.toLong)
    }
    assert(got == want)
    assert(got.find(_._1 == 4L).get._2 == "") // fully scrubbed, still emitted
    assert(got.find(_._1 == 5L).get._3 == 4L) // untouched
  }
}
