package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.text
import org.apache.spark.sql.expressions.Window
import SqlMacros._

/** Text-analysis operators over the documents table (training-data
  * pipeline extensions): tokenization stats, heuristic language-ID,
  * quality scoring, fingerprinting + shingling. All per-row `Column`
  * kernels — embarrassingly parallel, no shuffle except final sort.
  */
object TextQ extends QueryPack {

  /** Marker vocabularies for the heuristic language-ID demo (classes are
    * content domains; the same scoring runs identically in the oracle).
    */
  val LangClasses: Seq[(String, Seq[String])] = Seq(
    "eng"    -> Seq("the", "a", "of", "and", "to"),
    "db"     -> Seq("table", "query", "join", "filter", "index"),
    "perf"   -> Seq("slow", "fast", "big", "small"),
    "stream" -> Seq("stream", "window", "batch", "event"))

  val StopWords: Seq[String] = Seq("the", "a", "of", "and", "to", "is", "in")

  /** Fixed disjunctive query for the t12 BM25 demo. */
  val Bm25Terms: Seq[String] = Seq("spark", "window", "merge")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t01_token_stats" -> { (s, dir) =>
      Tables(s, dir).documents.select(
          col("doc_id"),
          text.tokenCount(col("text")).as("n_tokens"),
          length(regexp_replace(text.normText(col("text")), " ", ""))
            .as("n_alnum"))
        .orderBy(col("doc_id"))
    },

    "t02_lang_id" -> { (s, dir) =>
      Tables(s, dir).documents.select(
          col("doc_id"), col("lang"),
          text.langId(col("text"), LangClasses).as("predicted"))
        .orderBy(col("doc_id"))
    },

    // TF-IDF building blocks, integer-only for cross-engine determinism:
    // per-doc top-3 terms by term frequency with each term's document
    // frequency attached (the caller computes idf = ln(N/df) at use
    // time — transcendental outputs would reintroduce libm drift).
    // Shape at scale: one shuffle on (doc, term), one on term, a per-doc
    // window, and a term-keyed join that AQE broadcasts (vocabulary ≪
    // corpus).
    "t07_tfidf_top_terms" -> { (s, dir) =>
      val tok = Tables(s, dir).documents
        .select(col("doc_id"), explode(text.tokens(col("text"))).as("term"))
        .filter(col("term") =!= "")
      val tf = tok.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tf").desc, col("term"))
      tf.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).drop("rn")
        .join(dfreq, Seq("term"))
        .select(col("doc_id"), col("term"), col("tf"), col("df"))
        .orderBy(col("doc_id"), col("tf").desc, col("term"))
    },

    "t03_quality_score" -> { (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"), col("n_chars"),
          text.tokenCount(col("text")).as("n_tok"),
          text.markerHits(col("text"), StopWords).as("stops"),
          size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9 ]"), lit(0)))
            .as("punct"))
        .filter(col("n_tok") > 0)
        // Exact integer basis points on the common denominator
        // n_tok·n_chars, half-up via (2·num + den) div (2·den): the
        // float form (0.4·min(tok/100,1) + …, round 4dp) lands on exact
        // decimal halves for ~0.06% of docs, where Spark's round
        // (HALF_UP on the shortest decimal repr) and DuckDB's (binary
        // double) disagree. All-integer arithmetic is bit-deterministic
        // in both engines; quality = bp/10⁴ is one exact IEEE division.
        // n_tok is IntegerType: widen to long BEFORE multiplying — the
        // int-typed prefix 4000·n_tok would overflow (ANSI: throw) at
        // n_tok ≥ ~537k, a ~3 MB document; the oracle is BIGINT throughout
        .withColumn("ltok", col("n_tok").cast("long"))
        .withColumn("num",
          lit(40L) * least(col("ltok"), lit(100L)) * col("ltok") * col("n_chars") +
            lit(3000L) * (col("ltok") - col("stops")) * col("n_chars") +
            lit(3000L) * (col("n_chars") - col("punct")) * col("ltok"))
        .withColumn("den", col("ltok") * col("n_chars"))
        .withColumn("bp", expr("(2 * num + den) div (2 * den)"))
        .withColumn("quality", col("bp").cast("double") / 10000)
        .withColumn("bucket",
          when(col("bp") >= 7000, "high")
            .when(col("bp") >= 4000, "mid")
            .otherwise("low"))
        .select(col("doc_id"), col("quality"), col("bucket"))
        .orderBy(col("doc_id"))
    },

    "t04_fingerprint_shingles" -> { (s, dir) =>
      // per-row MinHash kernel: shingle count + min salted hash come from
      // one codegen pass, no explode/aggregate/join — same values.
      val ms = graft.plans.MinHashShingles
        .minhashShingles(text.normText(col("text")), 1, 3)
      Tables(s, dir).documents
        .select(col("doc_id"), text.fingerprint(col("text")).as("fingerprint"),
          ms.as("__ms"))
        .select(col("doc_id"), col("fingerprint"),
          coalesce(col("__ms.n"), lit(0)).as("n_shingles"),
          col("__ms.mins").getItem(0).as("min_h1"))
        .orderBy(col("doc_id"))
    },

    // BPE-ish regex token counting (letter/digit/symbol runs) next to the
    // whitespace count — the two tokenizer flavors of a data pipeline.
    "t05_bpe_tokens" -> { (s, dir) =>
      Tables(s, dir).documents.select(
          col("doc_id"),
          text.bpeTokenCount(col("text")).as("n_bpe"),
          text.tokenCount(col("text")).as("n_ws"))
        .orderBy(col("doc_id"))
    },

    // Winnowing fingerprints (k=8 char grams, window w=4), long form.
    // The rolling-hash kernel is the whole cost; documentsKernelParallel
    // rebalances the ONE-task local one-row-group scan so it parallelizes
    // (measured 1.05→0.46 s at sf0.1), gated on the observed partition
    // count so a many-split cluster scan is left untouched.
    "t06_winnow_fingerprints" -> { (s, dir) =>
      Tables(s, dir).documentsKernelParallel
        .select(col("doc_id"),
          explode(text.winnowFingerprints(col("text"), 8, 4)).as("fp"))
        .orderBy(col("doc_id"), col("fp"))
    },

    // Benchmark decontamination: corpus docs (doc_id % 10 ≠ 7) leaking any
    // 8-gram of the held-out "benchmark" slice (doc_id % 10 = 7) — the
    // pre-training eval-leak scrub. The benchmark side reduces to distinct
    // grams and broadcasts; the corpus never shuffles (see
    // operators.Contamination).
    "t08_decontaminate" -> { (s, dir) =>
      val t = Tables(s, dir)
      graft.operators.Contamination.contaminatedDocs(
          // corpus side is kernel-dominated → same gated serial-scan fix
          // as d02/t06 (measured 0.51→0.43 s at sf0.1)
          t.documentsKernelParallel.filter(col("doc_id") % 10 =!= 7),
          t.documents.filter(col("doc_id") % 10 === 7),
          "doc_id", "text", n = 8)
        .orderBy(col("doc_id"))
    },

    // FUZZY decontamination: corpus docs whose 3-gram Jaccard vs some
    // benchmark doc clears 0.2 — catches paraphrased/re-templated eval
    // leaks the exact-overlap t08 test is blind to. Bench side broadcast
    // twice (grams + sizes); corpus text never shuffles.
    "t14_fuzzy_decontaminate" -> { (s, dir) =>
      val t = Tables(s, dir)
      graft.operators.Contamination.fuzzyContaminatedDocs(
          t.documentsKernelParallel.filter(col("doc_id") % 10 =!= 7),
          t.documents.filter(col("doc_id") % 10 === 7),
          "doc_id", "text", n = 3, thetaNum = 1, thetaDen = 5)
        .orderBy(col("a"), col("b"))
    },

    // Tokenizer vocabulary TRAINING: top-8 BPE merges learned from the
    // corpus (Sennrich get_stats + left-to-right fuse; deterministic
    // count-then-lexicographic tie-break). The only corpus-sized pass
    // is the word-frequency collapse; the merge loop runs on the
    // bounded vocab table. Oracle: the same 8 rounds unrolled as CTE
    // stages running the identical two-pass replace.
    "t15_bpe_merges" -> { (s, dir) =>
      graft.operators.BpeTrain
        .learnMerges(Tables(s, dir).documents, "text", k = 8)
        .orderBy(col("merge_rank"))
    },

    // Gopher/MassiveText repetition signals over 3-grams: duplicate-gram
    // ratio + most-frequent-gram share, the two repetition cut thresholds.
    "t09_repetition_stats" -> { (s, dir) =>
      graft.operators.Contamination.repetitionStats(
          Tables(s, dir).documents, "doc_id", "text", n = 3)
        .orderBy(col("doc_id"))
    },

    // Context-window chunking: 64-token windows every 48 tokens (16-token
    // overlap) — the training-sequence prep step. Per-row expressions
    // only (sequence/explode/slice): chunks distribute with their doc,
    // no shuffle, no window function.
    "t10_chunk_windows" -> { (s, dir) =>
      graft.operators.Chunking.chunkTokens(Tables(s, dir).documents,
          "doc_id", "text", chunkSize = 64, overlap = 16)
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // BM25 scoring (k1=1.2, b=0.75) for a fixed 3-term disjunctive
    // query — the retrieval scorer the t11 index feeds. No logarithm:
    // idf is the exact rational (N+1)/(df+1) (the t07 no-libm doctrine —
    // ln() drifts across engines; +,×,÷ are IEEE-exact everywhere), and
    // the score keeps ONE fixed association order mirrored textually by
    // the oracle, so the doubles are bit-identical cross-engine. Shape:
    // one aggregation over tokens, a one-row corpus-stats broadcast,
    // per-row scoring — the per-doc frame never shuffles again.
    "t12_bm25_topdocs" -> { (s, dir) =>
      val tok = Tables(s, dir).documents
        .select(col("doc_id"), explode(text.tokens(col("text"))).as("term"))
        .filter(col("term") =!= "")
      val perDocAggs = count(lit(1)).as("dl") +:
        Bm25Terms.zipWithIndex.map { case (t, i) =>
          sum(when(col("term") === t, 1L).otherwise(0L)).as(s"tf$i") }
      val perDoc = tok.groupBy(col("doc_id"))
        .agg(perDocAggs.head, perDocAggs.tail: _*)
      val statAggs = count(lit(1)).as("n_docs") +:
        sum(col("dl")).as("total_dl") +:
        Bm25Terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
      val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
      def tscore(i: Int) = when(col(s"tf$i") > 0,
        (col("n_docs") + 1).cast("double") / (col(s"df$i") + 1) *
          (col(s"tf$i") * lit(2.2)) /
          (col(s"tf$i") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") * col("n_docs") / col("total_dl"))))
        .otherwise(lit(0.0))
      perDoc.crossJoin(broadcast(stats))
        .filter(col("tf0") + col("tf1") + col("tf2") > 0)
        .withColumn("bm25", round(tscore(0) + tscore(1) + tscore(2), 4))
        .select(col("doc_id"), col("bm25"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(10)
    },

    // PII scrub (text.scrubPii): the redaction pass a corpus runs before
    // training. The synthetic corpus carries no PII, so the query plants
    // it deterministically — per-row conditional email/IPv4/phone
    // segments derived from doc_id, built with the SAME arithmetic in
    // the mirror — then reports match counts per class and the scrubbed
    // text. Counts vary 0/1 by row (mod-3/4/5 injection), so the oracle
    // hash actually pins the matcher, not a constant column; rows whose
    // segments are all absent pin scrub-as-identity on clean text.
    // All per-row codegen'd regex — no shuffle until the final sort.
    "t13_pii_scrub" -> { (s, dir) =>
      val id = col("doc_id")
      val etext = concat(col("text"),
        when(pmod(id, lit(3)) =!= 0,
          concat(lit(" contact u"), id, lit("@ex"), pmod(id, lit(7)),
            lit(".org"))).otherwise(lit("")),
        when(pmod(id, lit(4)) =!= 0,
          concat(lit(" from 10."), pmod(id, lit(256)), lit(".0."),
            pmod(id, lit(100)))).otherwise(lit("")),
        when(pmod(id, lit(5)) =!= 0,
          concat(lit(" tel 555-867-"),
            lpad(pmod(id, lit(10000)).cast("string"), 4, "0")))
          .otherwise(lit("")))
      Tables(s, dir).documents
        .select(id, text.piiScrubReport(etext).as("r"))
        .select(id,
          col("r.n_emails").as("n_emails"),
          col("r.n_ips").as("n_ips"),
          col("r.n_phones").as("n_phones"),
          col("r.scrubbed").as("scrubbed"))
        .orderBy(id)
    },

    // Inverted-index build (operators.Index): per term, document
    // frequency + the top-5 postings by (tf desc, doc id), serialized
    // doc-ordered. The word-soup corpus makes EVERY term stopword-hot
    // (df ≈ corpus size), so this exercises exactly the salted two-phase
    // top-k the operator exists for.
    "t11_inverted_index" -> { (s, dir) =>
      graft.operators.Index.invertedIndex(Tables(s, dir).documents,
          "doc_id", "text", maxPostings = 5, salts = 8)
        .orderBy(col("term"))
    }
  )

  private def langCase: String = {
    val scored = LangClasses.zipWithIndex.map { case ((name, ms), i) =>
      s"${markerHitsSql("w", ms)} AS s$i"
    }.mkString(",\n  ")
    val names = LangClasses.map(_._1)
    val best = s"greatest(${names.indices.map(i => s"s$i").mkString(", ")})"
    val chain = names.indices.map { i =>
      val conds = (i + 1 until names.size).map(j => s"s$i >= s$j")
      val cond = if (conds.isEmpty) "TRUE" else conds.mkString(" AND ")
      s"WHEN $cond THEN '${names(i)}'"
    }.mkString(" ")
    s"""WITH n AS (SELECT doc_id, lang, $normSql AS norm FROM documents),
       |w AS (SELECT doc_id, lang, ${wordsSql()} AS w FROM n),
       |s AS (SELECT doc_id, lang, $scored FROM w)
       |SELECT doc_id, lang,
       | CASE WHEN $best = 0 THEN 'und' $chain END AS predicted
       |FROM s ORDER BY doc_id""".stripMargin
  }

  def oracle: Map[String, String] = Map(
    // Mirrors Chunking.chunkTokens (64/16): starts every 48 tokens, a
    // window only when it contributes new tokens (st=0 or st+16 < nt);
    // DuckDB list slices are 1-based end-inclusive like Spark's slice.
    "t10_chunk_windows" ->
      s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
         |w AS (SELECT doc_id, ${wordsSql()} AS w,
         |        CASE WHEN norm = '' THEN 0 ELSE len(${wordsSql()}) END AS nt
         |      FROM n),
         |s AS (SELECT doc_id, w, nt,
         |        UNNEST(generate_series(0, nt - 1, 48)) AS st
         |      FROM w WHERE nt > 0)
         |SELECT doc_id, CAST(st // 48 AS INT) AS chunk_idx,
         | CAST(LEAST(64, nt - st) AS BIGINT) AS n_tokens,
         | array_to_string(w[st + 1 : st + 64], ' ') AS chunk_text
         |FROM s WHERE st = 0 OR st + 16 < nt
         |ORDER BY doc_id, chunk_idx""".stripMargin,

    // Same enrichment arithmetic as the Spark side; the regex subset is
    // dialect-shared (text.EmailPattern scaladoc), so Java regex and RE2
    // find identical matches. 'g' flag: DuckDB replaces first-only by
    // default where Spark replaces all.
    "t13_pii_scrub" -> {
      val e = graft.functions.text.EmailPattern
      val i = graft.functions.text.Ipv4Pattern
      val p = graft.functions.text.PhonePattern
      s"""WITH x AS (SELECT doc_id, text ||
         |  CASE WHEN doc_id % 3 <> 0 THEN ' contact u' ||
         |    CAST(doc_id AS VARCHAR) || '@ex' ||
         |    CAST(doc_id % 7 AS VARCHAR) || '.org' ELSE '' END ||
         |  CASE WHEN doc_id % 4 <> 0 THEN ' from 10.' ||
         |    CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
         |    CAST(doc_id % 100 AS VARCHAR) ELSE '' END ||
         |  CASE WHEN doc_id % 5 <> 0 THEN ' tel 555-867-' ||
         |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
         |  AS etext FROM documents)
         |SELECT doc_id,
         | CAST(len(regexp_extract_all(etext, '$e')) AS INT) AS n_emails,
         | CAST(len(regexp_extract_all(etext, '$i')) AS INT) AS n_ips,
         | CAST(len(regexp_extract_all(etext, '$p')) AS INT) AS n_phones,
         | regexp_replace(regexp_replace(regexp_replace(etext,
         |   '$e', '<EMAIL>', 'g'), '$i', '<IP>', 'g'), '$p', '<PHONE>', 'g')
         |  AS scrubbed
         |FROM x ORDER BY doc_id""".stripMargin
    },

    // Same fixed association order as the Spark expression — every op is
    // IEEE +,×,÷ on exactly-representable integer inputs, so the doubles
    // match bit-for-bit before the final 4dp round.
    "t12_bm25_topdocs" -> {
      def tscore(i: Int) =
        s"""CASE WHEN tf$i > 0 THEN
           |  CAST(n_docs + 1 AS DOUBLE) / (df$i + 1) * (tf$i * 2.2)
           |  / (tf$i + 1.2 * (0.25 + 0.75 * dl * n_docs / total_dl))
           | ELSE 0 END""".stripMargin
      val tfCols = Bm25Terms.zipWithIndex.map { case (t, i) =>
        s"CAST(SUM(CASE WHEN term = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS tf$i"
      }.mkString(",\n  ")
      val dfCols = Bm25Terms.indices.map(i =>
        s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
        .mkString(",\n  ")
      val scores = Bm25Terms.indices.map(tscore).mkString("\n + ")
      s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
         |t AS (SELECT doc_id, unnest(${wordsSql()}) AS term FROM n),
         |perdoc AS (SELECT doc_id, COUNT(*) AS dl,
         |  $tfCols
         | FROM t WHERE term <> '' GROUP BY doc_id),
         |stats AS (SELECT COUNT(*) AS n_docs,
         |  CAST(SUM(dl) AS BIGINT) AS total_dl,
         |  $dfCols
         | FROM perdoc)
         |SELECT doc_id, round($scores, 4) AS bm25
         |FROM perdoc, stats
         |WHERE tf0 + tf1 + tf2 > 0
         |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin
    },

    // The doc-ordered "doc:tf" serialization mirrors Index.postingsString;
    // the cap is the same (tf DESC, doc_id) total order.
    "t11_inverted_index" ->
      s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
         |t AS (SELECT doc_id, unnest(${wordsSql()}) AS term FROM n),
         |tf AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
         |       FROM t WHERE term <> '' GROUP BY term, doc_id),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         |r AS (SELECT *, row_number() OVER (PARTITION BY term
         |        ORDER BY tf DESC, doc_id) AS rn FROM tf)
         |SELECT r.term, dfreq.df, COUNT(*) AS n_postings,
         | string_agg(r.doc_id || ':' || r.tf, ',' ORDER BY r.doc_id)
         |   AS postings
         |FROM r JOIN dfreq ON r.term = dfreq.term
         |WHERE rn <= 5 GROUP BY r.term, dfreq.df ORDER BY r.term""".stripMargin,

    "t01_token_stats" ->
      s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents)
         |SELECT doc_id,
         | CAST(CASE WHEN norm = '' THEN 0
         |           ELSE len(${wordsSql()}) END AS INT) AS n_tokens,
         | CAST(length(replace(norm, ' ', '')) AS INT) AS n_alnum
         |FROM n ORDER BY doc_id""".stripMargin,

    "t02_lang_id" -> langCase,

    "t07_tfidf_top_terms" ->
      s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
         |t AS (SELECT doc_id, unnest(${wordsSql()}) AS term FROM n),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t
         |       WHERE term <> '' GROUP BY doc_id, term),
         |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |        ORDER BY tf DESC, term) AS rn FROM tf)
         |SELECT r.doc_id, r.term, r.tf, df.df
         |FROM r JOIN df ON r.term = df.term WHERE rn <= 3
         |ORDER BY doc_id, tf DESC, r.term""".stripMargin,

    "t03_quality_score" ->
      s"""WITH n AS (
         | SELECT doc_id, n_chars, $normSql AS norm,
         |  len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS punct
         | FROM documents),
         |w AS (
         | SELECT doc_id, n_chars, punct,
         |  CASE WHEN norm = '' THEN 0 ELSE len(${wordsSql()}) END AS n_tok,
         |  ${markerHitsSql(wordsSql(), StopWords)} AS stops
         | FROM n),
         |q AS (
         | SELECT doc_id,
         |  (2 * (40 * least(n_tok, 100) * n_tok * n_chars
         |        + 3000 * (n_tok - stops) * n_chars
         |        + 3000 * (n_chars - punct) * n_tok)
         |   + n_tok * n_chars) // (2 * n_tok * n_chars) AS bp
         | FROM w WHERE n_tok > 0)
         |SELECT doc_id, CAST(bp AS DOUBLE)/10000 AS quality,
         | CASE WHEN bp >= 7000 THEN 'high'
         |      WHEN bp >= 4000 THEN 'mid' ELSE 'low' END AS bucket
         |FROM q ORDER BY doc_id""".stripMargin,

    "t04_fingerprint_shingles" ->
      s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
         |w AS (SELECT doc_id, norm, ${wordsSql()} AS w FROM n)
         |SELECT doc_id, md5(norm) AS fingerprint,
         | CAST(CASE WHEN len(w) >= 3 THEN len(w) - 2 ELSE 0 END AS INT) AS n_shingles,
         | CASE WHEN len(w) >= 3
         |  THEN list_min([${saltedHash32Sql("x", 1)}
         |        FOR x IN ${shingles3Sql()}])
         |  ELSE NULL END AS min_h1
         |FROM w ORDER BY doc_id""".stripMargin,

    "t05_bpe_tokens" ->
      s"""WITH n AS (SELECT doc_id, text, $normSql AS norm FROM documents)
         |SELECT doc_id,
         | CAST(len(regexp_extract_all(text,
         |   '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\f\\r]+')) AS INT) AS n_bpe,
         | CAST(CASE WHEN norm = '' THEN 0
         |           ELSE len(${wordsSql()}) END AS INT) AS n_ws
         |FROM n ORDER BY doc_id""".stripMargin,

    "t06_winnow_fingerprints" ->
      s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
         |g AS (SELECT doc_id,
         |  [('0x' || substr(md5(substr(norm, i, 8)), 1, 8))::BIGINT
         |   FOR i IN generate_series(1, len(norm) - 7)] AS hs
         | FROM n WHERE len(norm) >= 8),
         |sel AS (SELECT doc_id,
         |  list_distinct([list_min(hs[i:i+3])
         |   FOR i IN generate_series(1, greatest(len(hs) - 3, 1))]) AS fps
         | FROM g)
         |SELECT doc_id, unnest(fps) AS fp FROM sel ORDER BY doc_id, fp""".stripMargin,

    // Distinct 8-grams per doc (same n/w/sh/tok chain as d09's oracle),
    // benchmark slice = doc_id % 10 = 7, corpus = the rest.
    "t08_decontaminate" ->
      s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
         |w AS (SELECT doc_id, ${wordsSql()} AS w FROM n),
         |sh AS (SELECT doc_id, ${shinglesNSql("w", 8)} AS sh FROM w
         |       WHERE len(w) >= 8),
         |tok AS (SELECT DISTINCT doc_id, t
         |        FROM (SELECT doc_id, unnest(sh) AS t FROM sh)
         |        WHERE t <> ''),
         |bg AS (SELECT DISTINCT t FROM tok WHERE doc_id % 10 = 7)
         |SELECT c.doc_id, COUNT(*) AS n_hit_grams
         |FROM tok c JOIN bg USING (t) WHERE c.doc_id % 10 <> 7
         |GROUP BY c.doc_id ORDER BY doc_id""".stripMargin,

    // 8 unrolled BPE rounds: pair-count argmax (count DESC, then
    // lexicographic) + the SAME two-pass sentinel-padded replace the
    // operator runs — textual mirror, so the fuse semantics cannot
    // diverge between engines.
    "t15_bpe_merges" -> {
      val k = 8
      val stages = (1 to k).map { i =>
        s"""p$i AS (SELECT a[x] AS l, a[x + 1] AS r, freq
           |  FROM (SELECT string_split(sym, ' ') AS a, freq,
           |          unnest(range(1, len(string_split(sym, ' ')))) AS x
           |        FROM s${i - 1})),
           |b$i AS (SELECT l, r, CAST(SUM(freq) AS BIGINT) AS cnt
           |        FROM p$i GROUP BY l, r
           |        ORDER BY cnt DESC, l, r LIMIT 1),
           |s$i AS (SELECT trim(replace(replace(' ' || sym || ' ',
           |    ' ' || b.l || ' ' || b.r || ' ', ' ' || b.l || b.r || ' '),
           |    ' ' || b.l || ' ' || b.r || ' ', ' ' || b.l || b.r || ' '))
           |    AS sym, freq
           |  FROM s${i - 1}, b$i b)""".stripMargin
      }.mkString(",\n")
      val out = (1 to k)
        .map(i => s"SELECT $i AS merge_rank, l AS lhs, r AS rhs, cnt FROM b$i")
        .mkString("\nUNION ALL ")
      s"""WITH n AS (SELECT $normSql AS norm FROM documents),
         |wds AS (SELECT unnest(${wordsSql()}) AS word FROM n),
         |wf AS (SELECT word, COUNT(*) AS freq FROM wds
         |       WHERE word <> '' GROUP BY word),
         |s0 AS (SELECT array_to_string(string_split(word, ''), ' ') AS sym,
         |         freq FROM wf),
         |$stages
         |$out
         |ORDER BY merge_rank""".stripMargin
    },

    // Same n/w/sh/tok chain as d09's oracle at n=3; integer
    // cross-multiplied threshold mirrors the operator's exact cut.
    "t14_fuzzy_decontaminate" ->
      s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
         |w AS (SELECT doc_id, ${wordsSql()} AS w FROM n),
         |sh AS (SELECT doc_id, ${shingles3Sql()} AS sh FROM w
         |       WHERE len(w) >= 3),
         |tok AS (SELECT DISTINCT doc_id, t
         |        FROM (SELECT doc_id, unnest(sh) AS t FROM sh)
         |        WHERE t <> ''),
         |c AS (SELECT doc_id AS a, t FROM tok WHERE doc_id % 10 <> 7),
         |bgd AS (SELECT doc_id AS b, t FROM tok WHERE doc_id % 10 = 7),
         |la AS (SELECT a, COUNT(*) AS la FROM c GROUP BY a),
         |lb AS (SELECT b, COUNT(*) AS lb FROM bgd GROUP BY b),
         |i AS (SELECT a, b, COUNT(*) AS inter
         |      FROM c JOIN bgd USING (t) GROUP BY a, b)
         |SELECT a, b,
         | round(CAST(inter AS DOUBLE) / (la + lb - inter), 4) AS jaccard
         |FROM i JOIN la USING (a) JOIN lb USING (b)
         |WHERE inter * 5 >= (la + lb - inter) * 1
         |ORDER BY a, b""".stripMargin,

    "t09_repetition_stats" ->
      s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
         |w AS (SELECT doc_id, ${wordsSql()} AS w FROM n),
         |sh AS (SELECT doc_id, unnest(${shingles3Sql()}) AS s FROM w
         |       WHERE len(w) >= 3),
         |f AS (SELECT doc_id, s FROM sh WHERE s <> ''),
         |g AS (SELECT doc_id, s, COUNT(*) AS c FROM f GROUP BY doc_id, s)
         |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
         | COUNT(*) AS n_distinct,
         | round(1 - COUNT(*) / CAST(SUM(c) AS DOUBLE), 4) AS dup_ratio,
         | round(MAX(c) / CAST(SUM(c) AS DOUBLE), 4) AS top_share
         |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
