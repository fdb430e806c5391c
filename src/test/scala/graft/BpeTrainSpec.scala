package graft

import org.apache.spark.sql.functions._
import graft.operators.BpeTrain

/** BPE merge induction AND encode pinned against an independent serial
  * implementation of the classic algorithm (word-freq collapse →
  * weighted adjacent-pair counts at every position → argmax with
  * count-then-lexicographic tie-break → left-to-right non-overlapping
  * fuse), including the self-pair run words (runs of 5/7/9 of one
  * character) where the original two-pass-replace fuse DID diverge from
  * the fold — the cases that forced the BpeApply kernel rewrite.
  */
class BpeTrainSpec extends SparkTestBase {
  import spark.implicits._

  private def norm(s: String): String = s.toLowerCase
    .replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim

  /** One serial left-to-right non-overlapping fuse of (l, r) in v. */
  private def fuse(v: Vector[String], l: String, r: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < v.length) {
      if (i < v.length - 1 && v(i) == l && v(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += v(i); i += 1 }
    }
    b.result()
  }

  /** Reference implementation: the textbook serial form. */
  private def serialBpe(docs: Seq[String], k: Int): Seq[(Int, String, String, Long)] = {
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
        syms = syms.map { case (w, (v, f)) => w -> (fuse(v, l, r), f) }
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

  test("learnMergesCached: trains once, replays on fingerprint match, " +
    "retrains on content change") {
    import org.apache.spark.sql.functions.{col, lit}
    val table = "graft_bpe_merges_spec"
    val d1 = Seq("low low low low low", "lower lower newest newest")
      .toDF("text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("merge_rank").as[(Int, String, String, Long)]
        .collect().toSeq
    // miss → trains and equals the direct train
    val first = rows(BpeTrain.learnMergesCached(d1, "text", 4, table))
    assert(first == rows(BpeTrain.learnMerges(d1, "text", 4)))
    // hit is OBSERVABLE: tamper the persisted rows but keep the
    // fingerprint — a second call must return the tampered rows
    // (it read the table, not the corpus)
    val fp = spark.table(table).select("fp").limit(1)
      .collect()(0).getString(0)
    graft.sources.Warehouse.writeTable(
      BpeTrain.learnMerges(d1, "text", 4)
        .withColumn("lhs", lit("TAMPERED")).withColumn("fp", lit(fp)),
      table)
    val replayed = rows(BpeTrain.learnMergesCached(d1, "text", 4, table))
    assert(replayed.forall(_._2 == "TAMPERED"), s"cache not hit: $replayed")
    // content change → fingerprint mismatch → retrain overwrites
    val d2 = Seq("widest widest widest", "newest newest").toDF("text")
    val retrained = rows(BpeTrain.learnMergesCached(d2, "text", 4, table))
    assert(retrained == rows(BpeTrain.learnMerges(d2, "text", 4)))
    assert(retrained.forall(_._2 != "TAMPERED"))
    // a k change alone also misses (fingerprint carries k)
    assert(BpeTrain.corpusFingerprint(d2, "text", 4) !=
      BpeTrain.corpusFingerprint(d2, "text", 5))
    // TORN table (mixed fingerprints — the residue of a failed partial
    // overwrite): rows carrying the matching fp alongside stale-fp rows
    // must read as a MISS and retrain, not replay the torn mixture
    val fp2 = BpeTrain.corpusFingerprint(d2, "text", 4)
    graft.sources.Warehouse.writeTable(
      BpeTrain.learnMerges(d2, "text", 4).withColumn("fp", lit(fp2))
        .unionByName(BpeTrain.learnMerges(d1, "text", 4)
          .withColumn("lhs", lit("TORN")).withColumn("fp", lit("stale"))),
      table)
    val healed = rows(BpeTrain.learnMergesCached(d2, "text", 4, table))
    assert(healed == rows(BpeTrain.learnMerges(d2, "text", 4)))
    assert(healed.forall(_._2 != "TORN"))
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("overlapping runs: kernel fuse equals the left-to-right fold") {
    // 'aaaa' must fuse to 'aa aa', 'aaa' to 'aa a'; then rounds over
    // the aa symbols keep exercising runs of a multi-char symbol
    val docs = Seq("aaaa aaa baaab aaaa aaaa", "aa aaaa caac")
    assert(learned(docs, 6) == serialBpe(docs, 6))
  }

  test("self-pair runs of 5/7/9: training fuse pairs from the left " +
    "(the two-pass-replace divergence class)") {
    // a 9-run under (a,a) must yield 4×aa + a (the replace form produced
    // 3×aa + 3×a — wrong multiset, wrong next-round pair counts)
    val docs = Seq("aaaaa aaaaaaa aaaaaaaaa", "aaaaaaaaa aaaaaaaaa bb")
    assert(learned(docs, 8) == serialBpe(docs, 8))
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

  /** Serial reference ENCODE: merges replayed in rank order, each the
    * same left-to-right non-overlapping fuse as training — the contract
    * BpeTrain.encode's kernel pass must reproduce.
    */
  private def serialEncode(doc: String,
                           merges: Seq[(String, String)]): Seq[String] =
    norm(doc).split(" ").filter(_.nonEmpty).toSeq.flatMap { w =>
      merges.foldLeft(w.map(_.toString).toVector) {
        case (v, (l, r)) => fuse(v, l, r)
      }
    }

  private def encoded(docs: Seq[String],
                      merges: Seq[(String, String)]): Seq[Seq[String]] =
    docs.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("id", "text")
      .select($"id", BpeTrain.encode($"text", merges).as("toks"))
      .orderBy("id")
      .as[(Int, Seq[String])].collect().toSeq.map(_._2)

  test("encode: full token sequences match serial on the textbook docs") {
    val docs = Seq("low low low low low", "lower lower newest newest",
      "newest newest newest newest", "widest widest widest",
      "Lowest, NEWest; widest!")
    val merges = serialBpe(docs, 10).map(m => (m._2, m._3))
    assert(encoded(docs, merges) == docs.map(serialEncode(_, merges)))
  }

  test("encode: overlapping and self-pair runs equal the fold") {
    val docs = Seq("aaaa aaa baaab aaaa aaaa", "aa aaaa caac",
      "aaaaaaa a", "aaaaaaaaa aaaaa")
    val merges = serialBpe(docs, 6).map(m => (m._2, m._3))
    assert(encoded(docs, merges) == docs.map(serialEncode(_, merges)))
  }

  test("encode: matches serial on the real documents corpus, and " +
    "encodeTokenCount agrees with the sequence length") {
    val texts = Tables(spark, sfSmoke).documents
      .select("text").as[String].collect().toSeq
    val merges = serialBpe(texts, 8).map(m => (m._2, m._3))
    assert(encoded(texts, merges) == texts.map(serialEncode(_, merges)))
    val counts = texts.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("id", "text")
      .select($"id", BpeTrain.encodeTokenCount($"text", merges).as("n"))
      .orderBy("id").as[(Int, Long)].collect().toSeq.map(_._2)
    assert(counts == texts.map(serialEncode(_, merges).size.toLong))
  }

  test("encode: empty and punctuation-only text yields zero tokens") {
    val merges = Seq(("a", "b"))
    val got = encoded(Seq("", "  ", "?!... ---"), merges)
    assert(got == Seq(Seq(), Seq(), Seq()))
  }

  test("decode(encodeKeepSeps(x)) == normText(x) on the real corpus — " +
    "the tokenizer round-trip is lossless for any merge table") {
    val docs = Tables(spark, sfSmoke).documents.select("text")
    val texts = docs.as[String].collect().toSeq
    val merges = serialBpe(texts, 8).map(m => (m._2, m._3))
    val rows = docs.select(
        graft.functions.text.normText($"text").as("want"),
        BpeTrain.decode(BpeTrain.encodeKeepSeps($"text", merges)).as("got"))
      .as[(String, String)].collect()
    rows.foreach { case (want, got) =>
      assert(got == want, s"round-trip diverged: got '$got' want '$want'")
    }
    // and the budget view is exactly the lossless view minus separators
    val nBudget = docs
      .select(BpeTrain.encodeTokenCount($"text", merges)).as[Long].collect()
    val nKeep = docs
      .select(org.apache.spark.sql.functions.size(
        BpeTrain.encodeKeepSeps($"text", merges)).cast("long"))
      .as[Long].collect()
    assert(nBudget.zip(nKeep).forall { case (b, k) => b <= k })
  }
}
