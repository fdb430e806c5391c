package graft

import org.apache.spark.sql.functions._
import graft.operators.NgramLm

/** Bigram-LM scoring: hand-computed MLE cases (repeated transitions,
  * cross-doc statistics, sub-2-token docs) and serial parity over the
  * real corpus.
  */
class NgramLmSpec extends SparkTestBase {
  import spark.implicits._

  private def score(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] =
    NgramLm.bigramScore(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("hand-computed MLE: deterministic chain vs branching context") {
    // corpus: "a b" ×3 (doc 1..3), "a c" ×1 (doc 4) →
    //   c1(a)=4, c2(a b)=3, c2(a c)=1
    //   P(b|a)=3/4 → 7500 bp; P(c|a)=1/4 → 2500 bp
    // doc 5 has one token → (0, 0); doc 6 empty → (0, 0)
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"),
      (4L, "a c"), (5L, "solo"), (6L, ""))
    assert(score(docs) == Map(
      1L -> (1L, 7500L), 2L -> (1L, 7500L), 3L -> (1L, 7500L),
      4L -> (1L, 2500L), 5L -> (0L, 0L), 6L -> (0L, 0L)))
  }

  test("repeated transitions weight the average by tf") {
    // one doc: "x y x y x z" → bigrams: xy, yx, xy, yx, xz
    //   c1(x)=3, c1(y)=2; c2(xy)=2, c2(yx)=2, c2(xz)=1
    //   pbp: xy = 20000 div 3 = 6666; yx = 10000; xz = 3333
    //   sum = 2·6666 + 2·10000 + 3333 = 36665; avg = 36665 div 5 = 7333
    assert(score(Seq((1L, "x y x y x z"))) == Map(1L -> (5L, 7333L)))
  }

  test("matches an independent serial computation on the real corpus") {
    val corpus = Tables(spark, sfSmoke).documents
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    def toks(s: String): Seq[String] =
      s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ")
        .trim.split(" ").filter(_.nonEmpty).toSeq
    val bigrams = corpus.map { case (id, t) =>
      id -> toks(t).sliding(2).filter(_.size == 2)
        .map(p => (p(0), p(1))).toSeq
    }
    val c2 = bigrams.flatMap(_._2).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (k, v) => k -> v.values.sum }
    val expect = bigrams.map { case (id, bs) =>
      if (bs.isEmpty) id -> (0L, 0L)
      else {
        val spbp = bs.map(b => 10000L * c2(b) / c1(b._1)).sum
        id -> (bs.size.toLong, spbp / bs.size)
      }
    }.toMap
    val got = score(corpus)
    assert(got == expect)
    assert(got.values.exists(_._2 > 0))
  }
}
