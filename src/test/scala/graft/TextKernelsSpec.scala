package graft

import org.apache.spark.sql.functions._
import graft.plans.{CountInVocab, NormText}

/** Byte-equivalence of the native codegen text kernels against the
  * regex/HOF `Column` forms they replaced — the DuckDB oracles mirror the
  * regex forms, so any divergence here would silently break the oracle
  * gate (t01–t04, d02–d04) while tests stay green.
  */
class TextKernelsSpec extends SparkTestBase {
  import spark.implicits._

  private def regexNorm(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  private val adversarial = Seq(
    "",
    " ",
    "   ",
    "plain ascii words",
    "  Hi, there!! How's it going?  ",
    "MiXeD CaSe 123 AND-code_sep",
    "tabs\tand\nnewlines\r\nandverticals",
    "unicode: café naïve Bär 東京 тест مرحبا",
    "emoji 🎉🎊 between 🚀 words",
    "digits007mixed8with9letters",
    "!!!only---punct???",
    "a",
    "ü",
    "ends with punct!",
    "¡starts with punct",
    "combining é vs precomposed é",
    "ﬀ ligature and ÅUpper",
    "zero​width‌joined",
    "double  space   runs    inside"
  )

  test("NormText kernel is byte-equal to the regex pipeline") {
    val df = adversarial.toDF("t")
    val rows = df.select(
      NormText.normText(col("t")).as("native"),
      regexNorm(col("t")).as("regex")
    ).collect()
    rows.zip(adversarial).foreach { case (r, in) =>
      assert(r.getString(0) == r.getString(1),
        s"mismatch for ${in.take(40)}: native='${r.getString(0)}' regex='${r.getString(1)}'")
    }
  }

  test("NormText equals regex pipeline on the sf0.001 documents table") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
    val n = docs.select(
      NormText.normText(col("text")).as("native"),
      regexNorm(col("text")).as("regex")
    ).filter(col("native") =!= col("regex")).count()
    assert(n == 0, s"$n rows diverge")
  }

  test("CountInVocab equals the filter/array_contains HOF form") {
    val vocab = Seq("the", "a", "und", "der", "el", "la")
    val m = array(vocab.map(lit): _*)
    val df = (adversarial ++ Seq(
      "the the the a la",
      "der und der",
      "no markers here at all",
      "theater is not the"
    )).toDF("t")
    val rows = df.select(
      CountInVocab.countInVocab(NormText.normText(col("t")), vocab).as("native"),
      size(filter(split(regexNorm(col("t")), " "), t => array_contains(m, t))).as("hof")
    ).collect()
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), s"native=${r.getInt(0)} hof=${r.getInt(1)}")
    }
  }

  test("md5-prefix hash kernels equal the hex-string conv forms") {
    val inputs = adversarial ++ Seq("token", "the", "a b c", "ÿ", "0")
    val df = inputs.toDF("t")
    val rows = df.select(
      graft.plans.HashKernels.saltedHash32(col("t"), 7).as("n32"),
      conv(substring(md5(concat(lit("7:"), col("t"))), 1, 8), 16, 10)
        .cast("bigint").as("c32"),
      graft.plans.HashKernels.tokenHash16(col("t")).as("n16"),
      conv(substring(md5(col("t")), 1, 4), 16, 10).cast("int").as("c16")
    ).collect()
    rows.zip(inputs).foreach { case (r, in) =>
      assert(r.getLong(0) == r.getLong(1), s"salted32 mismatch for '$in'")
      assert(r.getInt(2) == r.getInt(3), s"hash16 mismatch for '$in'")
    }
  }

  test("winnow fingerprint edges: short text, exact window, ties") {
    import graft.functions.text
    def fps(s: String): Seq[Long] = Seq(s).toDF("t")
      .select(text.winnowFingerprints(col("t"), 3, 2).as("f"))
      .as[Seq[Long]].head()
    assert(fps("") == Seq.empty)          // no grams
    assert(fps("ab") == Seq.empty)        // shorter than k
    assert(fps("abc").length == 1)        // one gram, one (clamped) window
    assert(fps("abcd").nonEmpty)          // 2 grams, 1 window -> 1 pick
    // repeated content: identical window minima dedup to distinct picks
    val rep = fps("abcabcabcabc")
    assert(rep == rep.distinct)
    // selection is a subset of all gram hashes (sanity vs. brute force;
    // winnow hashes are unsalted md5 prefixes)
    val allRaw = "abcabcabcabc".sliding(3).toSeq.map { g =>
      Seq(g).toDF("g").select(
        conv(substring(md5(col("g")), 1, 8), 16, 10).cast("bigint").as("h"))
        .as[Long].head()
    }.toSet
    assert(rep.toSet.subsetOf(allRaw))
  }

  test("time codec kernels equal the format_string/rlike column forms") {
    val secs = Seq(0.0, 59.4, 59.5, 59.6, 60.5, 61.5, 3599.999, 3600.0,
      86399.0, 90600.0, 90600.4999, 1e9, 0.49999999999)
    val sdf = secs.toDF("s")
    val srows = sdf.select(
      graft.plans.TimeKernels.secToTime(col("s")).as("native"),
      format_string("%02d:%02d:%02d",
        (bround(col("s")).cast("bigint") / 3600).cast("bigint"),
        ((bround(col("s")).cast("bigint") % 3600) / 60).cast("bigint"),
        bround(col("s")).cast("bigint") % 60).as("column")
    ).collect()
    srows.zip(secs).foreach { case (r, in) =>
      assert(r.getString(0) == r.getString(1),
        s"secToTime($in): native=${r.getString(0)} column=${r.getString(1)}")
    }

    val times = Seq("25:10", "04:00", "23:59:30", "not a time", "9:05",
      "00:00:00", "123:45:01", ":30", "12:", "12:3", "12:345", "1:23:4",
      "1:23:456", "", "12:34:56:78", "12:a4", "٣:٤٥", "0:00")
    val m = times.toDF("t")
    val parts = split(col("t"), ":")
    val columnForm = when(col("t").rlike("^\\d+:\\d{2}(:\\d{2})?$"),
      parts.getItem(0).cast("int") * 3600 +
        parts.getItem(1).cast("int") * 60 +
        coalesce(try_element_at(parts, lit(3)).cast("int"), lit(0)))
      .otherwise(lit(0))
    val trows = m.select(
      graft.plans.TimeKernels.timeToSec(col("t")).as("native"),
      columnForm.as("column")).collect()
    trows.zip(times).foreach { case (r, in) =>
      val nv = if (r.isNullAt(0)) null else r.getInt(0)
      val cv = if (r.isNullAt(1)) null else r.getInt(1)
      assert(nv == cv, s"timeToSec('$in'): native=$nv column=$cv")
    }

    // absurd hour fields: the kernel is tolerant where the ANSI column
    // form would throw — beyond-INT hours parse to null, not an error
    val big = Seq("99999999999:00").toDF("t")
      .select(graft.plans.TimeKernels.timeToSec(col("t")).as("v")).collect()
    assert(big.head.isNullAt(0))

    // NULL input parses to 0 like when(rlike).otherwise(0) did (null
    // predicate -> otherwise branch) — the reference parse_time tolerance
    val nul = Seq(Tuple1[String](null)).toDF("t")
      .select(graft.plans.TimeKernels.timeToSec(col("t")).as("v")).collect()
    assert(!nul.head.isNullAt(0) && nul.head.getInt(0) == 0)
  }

  test("SimHash16 kernel equals the exploded vote pipeline on documents") {
    import graft.functions.text
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((90001L, ""), (90002L, "   !!   "), (90003L, "one"))
        .toDF("doc_id", "text"))
    val toks = docs
      .select(col("doc_id"), explode(text.tokens(col("text"))).as("tok"))
      .withColumn("h", text.tokenHash16(col("tok")))
    val bitSums = (0 until 16).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1)) === 1, 1).otherwise(-1))
        .as(s"s$b")
    }
    val sums = toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val simCol = (0 until 16)
      .map(b => when(col(s"s$b") > 0, lit(1 << b)).otherwise(lit(0)))
      .reduce[org.apache.spark.sql.Column](_ + _)
    val exploded = sums.select(col("doc_id"), simCol.cast("int").as("expl"))
    val native = docs.select(col("doc_id"),
      graft.plans.SimHash16.simhash16(text.normText(col("text"))).as("nat"))
    val n = native.join(exploded, Seq("doc_id"))
      .filter(col("nat") =!= col("expl")).count()
    assert(n == 0, s"$n docs diverge")
  }

  test("SimHash64 kernel equals the exploded vote pipeline on documents") {
    import graft.functions.text
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((90001L, ""), (90002L, "   !!   "), (90003L, "one"))
        .toDF("doc_id", "text"))
    val toks = docs
      .select(col("doc_id"), explode(text.tokens(col("text"))).as("tok"))
      .withColumn("h", graft.plans.HashKernels.tokenHash64(col("tok")))
    val bitSums = (0 until 64).map { b =>
      // >>> semantics: mask after an arithmetic shift
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1, 1).otherwise(-1))
        .as(s"s$b")
    }
    val sums = toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val simCol = (0 until 64)
      .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce[org.apache.spark.sql.Column](_.bitwiseOR(_))
    val exploded = sums.select(col("doc_id"), simCol.as("expl"))
    val native = docs.select(col("doc_id"),
      graft.plans.SimHash64.simhash64(text.normText(col("text"))).as("nat"))
    val n = native.join(exploded, Seq("doc_id"))
      .filter(col("nat") =!= col("expl")).count()
    assert(n == 0, s"$n docs diverge")
  }

  test("simhash64Pairs equals brute force at hamming <= 3 (banding recall)") {
    // pigeonhole: <= 3 differing bits leave >= 1 of the 4 16-bit bands
    // equal, so banded candidate generation must find EVERY such pair —
    // compare against the driver-side all-pairs filter on real docs
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("doc_id"), col("text"))
    val sigs = Dedup.simhash64(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val brute = (for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      h = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2) if h <= 3
    } yield (sigs(i)._1, sigs(j)._1, h)).toSet
    val banded = Dedup.simhash64Pairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute,
      s"banded=${banded.size} brute=${brute.size} diff=${(banded diff brute).take(3)}")
  }

  test("prefixJaccardPairs equals brute force (exact recall of the prefix filter)") {
    // unlike LSH, prefix filtering is exact: the pairs above θ must be
    // EXACTLY the brute-force all-pairs result, not a subset
    import graft.operators.Dedup
    import graft.functions.text
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("doc_id"), col("text"))
    val toks = docs
      .select(col("doc_id"), array_distinct(text.tokens(col("text"))).as("ts"))
      .select(col("doc_id"), array_remove(col("ts"), "").as("ts"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).sortBy(_._1)
    val brute = (for {
      i <- toks.indices; j <- (i + 1) until toks.length
      inter = (toks(i)._2 intersect toks(j)._2).size
      uni = (toks(i)._2 union toks(j)._2).size
      if uni > 0 && inter * 5 >= uni * 3
    } yield (toks(i)._1, toks(j)._1)).toSet
    val got = Dedup.prefixJaccardPairs(docs, "doc_id", "text", 3, 5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute,
      s"got=${got.size} brute=${brute.size} missing=${(brute diff got).take(3)}")
  }

  test("MinHashShingles kernel equals the exploded shingle pipeline") {
    import graft.functions.text
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((90001L, ""), (90002L, "one two"), (90003L, "a b c"),
        (90004L, "x x x x")).toDF("doc_id", "text"))
    val k = 4
    // exploded reference: mins + distinct set + count from shingle rows
    val long = Dedup.shingleRows(docs, "doc_id", "text", 3)
    val hashCols = (1 to k).map(j => text.saltedHash32(col("s"), j).as(s"h$j"))
    val aggs = (1 to k).map(j => min(col(s"h$j")).as(s"em$j")) ++ Seq(
      array_distinct(collect_list(col("s"))).as("esh"),
      count(lit(1)).cast("int").as("en"))
    val ref = long.select(col("doc_id") +: col("s") +: hashCols: _*)
      .groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    val ms = graft.plans.MinHashShingles
      .minhashShingles(text.normText(col("text")), k, 3)
    val native = docs.select(col("doc_id"), ms.as("m"))
      .filter(col("m").isNotNull)
      .select(col("doc_id") +:
        (1 to k).map(j => col("m.mins").getItem(j - 1).as(s"nm$j")) :+
        col("m.sh").as("nsh") :+ col("m.n").as("nn"): _*)
    assert(native.count() == ref.count(), "doc coverage differs")
    val joined = native.join(ref, Seq("doc_id"))
    val bad = joined.filter(
      (1 to k).map(j => col(s"nm$j") =!= col(s"em$j")).reduce(_ || _) ||
        col("nn") =!= col("en") ||
        size(array_except(col("nsh"), col("esh"))) =!= 0 ||
        size(array_except(col("esh"), col("nsh"))) =!= 0).count()
    assert(bad == 0, s"$bad docs diverge")
  }

  test("kernels are callable from SQL via GraftExtensions") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT norm_text('  Hi, There!! ') AS n,
        |  simhash16(norm_text('hello world')) AS sh,
        |  time_to_sec(sec_to_time(90600)) AS rt,
        |  md5_prefix32('token', 7) AS h32,
        |  count_in_vocab('the cat the', 'the', 'a') AS civ,
        |  size(winnow('abcdefghijklmno', 8, 4)) AS nw,
        |  minhash_shingles('a b c d', 2, 3).n AS nsh
        |""".stripMargin).collect()(0)
    assert(r.getAs[String]("n") == "hi there")
    assert(r.getAs[Int]("rt") == 90600)
    assert(r.getAs[Int]("civ") == 2)
    assert(r.getAs[Int]("nsh") == 2)
    assert(r.getAs[Int]("nw") >= 1)
    assert(!r.isNullAt(r.fieldIndex("sh")) && !r.isNullAt(r.fieldIndex("h32")))
  }

  test("CountInVocab counts occurrences without dedup on real documents") {
    val vocab = Seq("the", "and", "of", "to", "in")
    val m = array(vocab.map(lit): _*)
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
    val n = docs.select(
      CountInVocab.countInVocab(NormText.normText(col("text")), vocab).as("native"),
      size(filter(split(regexNorm(col("text")), " "), t => array_contains(m, t))).as("hof")
    ).filter(col("native") =!= col("hof")).count()
    assert(n == 0, s"$n rows diverge")
  }
}
