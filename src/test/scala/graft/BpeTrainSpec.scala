package graft

import org.apache.spark.sql.functions._
import graft.operators.BpeTrain

/** BPE merge induction pinned against an independent serial
  * implementation of the classic algorithm (word-freq collapse →
  * weighted adjacent-pair counts at every position → argmax with
  * count-then-lexicographic tie-break → left-to-right non-overlapping
  * fuse), including the overlapping-run words where the operator's
  * two-pass-replace fuse could plausibly diverge from the fold.
  */
class BpeTrainSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference implementation: the textbook serial form. */
  private def serialBpe(docs: Seq[String], k: Int): Seq[(Int, String, String, Long)] = {
    def norm(s: String): String = s.toLowerCase
      .replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim
    val wf = docs.map(norm).flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    var syms: Map[String, (Vector[String], Long)] =
      wf.map { case (w, f) => w -> (w.map(_.toString).toVector, f) }
    val out = Vector.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((_, (v, f)) <- syms; i <- 0 until v.length - 1)
        counts((v(i), v(i + 1))) = counts.getOrElse((v(i), v(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), cnt) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((rank, l, r, cnt))
        syms = syms.map { case (w, (v, f)) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < v.length) {
            if (i < v.length - 1 && v(i) == l && v(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += v(i); i += 1 }
          }
          w -> (b.result(), f)
        }
        rank += 1
      }
    }
    out.result()
  }

  private def learned(docs: Seq[String], k: Int) =
    BpeTrain.learnMerges(docs.toDF("text"), "text", k)
      .orderBy("merge_rank")
      .as[(Int, String, String, Long)].collect().toSeq

  test("textbook example: merges, weights, and tie-breaks match serial") {
    val docs = Seq("low low low low low", "lower lower newest newest",
      "newest newest newest newest", "widest widest widest")
    assert(learned(docs, 10) == serialBpe(docs, 10))
  }

  test("overlapping runs: two-pass replace equals the left-to-right fold") {
    // 'aaaa' must fuse to 'aa aa', 'aaa' to 'aa a'; then rounds over
    // the aa symbols keep exercising runs of a multi-char symbol
    val docs = Seq("aaaa aaa baaab aaaa aaaa", "aa aaaa caac")
    assert(learned(docs, 6) == serialBpe(docs, 6))
  }

  test("vocabulary exhaustion stops early with fewer than k rows") {
    val docs = Seq("ab ab")
    val got = learned(docs, 5)
    // 1 merge (a,b) then the single 2-char word has no pairs left
    assert(got == Seq((1, "a", "b", 2L)))
  }

  test("matches serial on the real documents corpus") {
    val texts = Tables(spark, sfSmoke).documents
      .select("text").as[String].collect().toSeq
    assert(learned(texts, 6) == serialBpe(texts, 6))
  }
}
