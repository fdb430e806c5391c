package graft

import org.apache.spark.sql.functions._
import graft.operators.SparseSim

/** SparseSim.tfidfCosinePairs: serial-reference parity on a crafted
  * corpus, plus the pruning-space semantics the oracle mirrors (df=1
  * terms weigh in norms but never join; boilerplate terms vanish from
  * both).
  */
class SparseSimSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent serial reference: same integer weighting, plain maps. */
  private def serial(docs: Seq[(Long, String)], maxDfFrac: Int,
                     tau: Double): Seq[(Long, Long, Double)] = {
    val n = docs.size
    val tf = docs.map { case (id, t) =>
      id -> t.toLowerCase.replaceAll("[^a-z0-9 ]", " ").trim
        .split(" +").filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(v => math.min(v.size, 255)).toMap
    }.toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .view.mapValues(_.size).toMap
    def w(id: Long): Map[String, BigInt] = tf(id).collect {
      case (t, f) if df(t) * maxDfFrac <= n =>
        t -> BigInt(f) * (100L * n / df(t))
    }
    val norms = docs.map { case (id, _) =>
      id -> w(id).values.map(x => x * x).sum }.toMap
    for {
      (a, _) <- docs; (b, _) <- docs if a < b
      shared = w(a).keySet.intersect(w(b).keySet)
        .filter(t => df(t) >= 2)
      if shared.nonEmpty
      dot = shared.toSeq.map(t => w(a)(t) * w(b)(t)).sum
      cos = dot.toDouble /
        (math.sqrt(norms(a).toDouble) * math.sqrt(norms(b).toDouble))
      if cos >= tau
    } yield (a, b, BigDecimal(cos)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  private val corpus = Seq(
    1L -> "alpha beta gamma delta alpha",
    2L -> "alpha beta gamma delta",
    3L -> "epsilon zeta eta theta",
    4L -> "epsilon zeta eta theta iota",
    5L -> "alpha beta gamma delta alpha",
    6L -> "unrelated words entirely different",
    7L -> "kappa lambda", // singleton terms: norm mass, no pairs
    8L -> "beta gamma delta epsilon zeta")

  test("matches the serial integer reference on a crafted corpus") {
    val got = SparseSim.tfidfCosinePairs(corpus.toDF("doc_id", "text"),
        "doc_id", "text", tauNum = 1, tauDen = 2, maxDfFrac = 1)
      .orderBy(col("a"), col("b"))
      .as[(Long, Long, Double)].collect().toSeq
    val want = serial(corpus, maxDfFrac = 1, tau = 0.5)
      .sortBy(p => (p._1, p._2))
    assert(got == want)
    // identical docs 1 and 5 must score exactly 1.0
    assert(got.exists { case (a, b, c) => a == 1L && b == 5L && c == 1.0 })
  }

  test("prefix filter is lossless on real docs: equals the serial " +
      "all-pairs reference at a low threshold (prefixes really prune)") {
    // τ = 2/5: the suffix may hold up to 96% of each doc's norm², so
    // prefixes are a small fraction of postings — if the filter dropped
    // a qualifying candidate, this corpus-scale comparison would miss a
    // pair the serial reference finds
    val docs = Tables(spark, sfSmoke).documents
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id")).limit(300)
      .as[(Long, String)].collect().toSeq
    val got = SparseSim.tfidfCosinePairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", tauNum = 2, tauDen = 5, maxDfFrac = 10)
      .orderBy(col("a"), col("b"))
      .as[(Long, Long, Double)].collect().toSeq
    val want = serial(docs, maxDfFrac = 10, tau = 0.4)
      .sortBy(p => (p._1, p._2))
    assert(got.nonEmpty, "degenerate fixture: no pairs at tau=0.4")
    assert(got == want)
  }

  test("prefix+bound filters are lossless on a skewed tiny-vocabulary " +
      "corpus (asymmetric prefix/suffix shared terms carry real mass)") {
    // deterministic pseudo-random corpus from an 8-term vocabulary with
    // Zipf-ish repetition: many shared terms land in one doc's prefix
    // but the other's suffix — the exact case an earlier suffix-only
    // bound missed (caught by the sf1 oracle; this pins the repair).
    // Thresholds span loose to tight so both the membership and the
    // bound arms are exercised.
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    def lcg(s: Long): Long = (s * 6364136223846793005L + 1442695040888963407L)
    val docs = (0L until 120L).map { i =>
      var st = lcg(i + 7)
      val len = 3 + (math.abs(st) % 9).toInt
      val words = (0 until len).map { k =>
        st = lcg(st)
        // Zipf-ish: low vocab indices repeat more
        val v = vocab((math.abs(st) % 64 % vocab.size).toInt)
        val reps = 1 + (math.abs(lcg(st + k)) % 4).toInt
        Seq.fill(reps)(v).mkString(" ")
      }
      i -> words.mkString(" ")
    }
    for ((tn, td) <- Seq((1, 2), (3, 4), (19, 20))) {
      val got = SparseSim.tfidfCosinePairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", tauNum = tn, tauDen = td, maxDfFrac = 1)
        .orderBy(col("a"), col("b"))
        .as[(Long, Long, Double)].collect().toSeq
      val want = serial(docs, maxDfFrac = 1, tau = tn.toDouble / td)
        .sortBy(p => (p._1, p._2))
      assert(got == want, s"tau=$tn/$td: got ${got.size} want ${want.size}")
      assert(want.nonEmpty, s"degenerate fixture at tau=$tn/$td")
    }
  }

  test("df=1 terms weigh in norms but never produce pairs") {
    // doc 7's terms are all df=1: it appears in no pair, and adding a
    // df=1 term to a doc LOWERS its cosines (norm grows, dots don't)
    val base = SparseSim.tfidfCosinePairs(corpus.toDF("doc_id", "text"),
        "doc_id", "text", 1, 100, maxDfFrac = 1)
      .as[(Long, Long, Double)].collect()
    assert(!base.exists(p => p._1 == 7L || p._2 == 7L))
    val padded = corpus.map { case (id, t) =>
      id -> (if (id == 2L) t + " uniquepad" else t) }
    val p2 = SparseSim.tfidfCosinePairs(padded.toDF("doc_id", "text"),
        "doc_id", "text", 1, 100, maxDfFrac = 1)
      .as[(Long, Long, Double)].collect()
    val before = base.find(p => p._1 == 1L && p._2 == 2L).get._3
    val after = p2.find(p => p._1 == 1L && p._2 == 2L).get._3
    assert(after < before)
  }

  test("boilerplate cut drops high-df terms from norms AND dots") {
    // 'the' in every doc: with maxDfFrac=2 (df·2 ≤ N fails at df=N) it
    // must not change any score vs the corpus without it
    val boiler = corpus.map { case (id, t) => id -> s"the $t the" }
    val cut = SparseSim.tfidfCosinePairs(boiler.toDF("doc_id", "text"),
        "doc_id", "text", 1, 100, maxDfFrac = 2)
      .orderBy(col("a"), col("b")).as[(Long, Long, Double)].collect().toSeq
    val clean = SparseSim.tfidfCosinePairs(corpus.toDF("doc_id", "text"),
        "doc_id", "text", 1, 100, maxDfFrac = 2)
      .orderBy(col("a"), col("b")).as[(Long, Long, Double)].collect().toSeq
    assert(cut == clean)
  }

  test("absolute maxDfCap bounds postings independent of corpus size") {
    // cap 2 excludes the df=3 'alpha beta gamma delta' template terms
    // even though the relative cut would keep them
    val capped = SparseSim.tfidfCosinePairs(corpus.toDF("doc_id", "text"),
        "doc_id", "text", 1, 100, maxDfFrac = 1, maxDfCap = 2)
      .as[(Long, Long, Double)].collect()
    // 1–5 share only df=3 template terms → the pair must vanish
    assert(!capped.exists(p => Set(p._1, p._2) == Set(1L, 5L)))
  }
}
