package graft.queries

/** DuckDB-SQL fragments that mirror graft.functions.text exactly (same
  * operation order and semantics) so oracle results hash-match.
  */
private[queries] object SqlMacros {

  /** Mirror of text.normText: lowercase, non-alnum→space, squeeze, trim.
    * DuckDB regexp_replace needs the 'g' flag (Spark's is global already).
    */
  val normSql: String =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  /** Mirror of text.tokens over a pre-computed `norm` column. */
  def wordsSql(norm: String = "norm"): String = s"string_split($norm, ' ')"

  /** Mirror of text.saltedHash32: first 8 md5 hex digits of "salt:s". */
  def saltedHash32Sql(expr: String, salt: Int): String =
    s"('0x' || substr(md5('$salt:' || ($expr)), 1, 8))::BIGINT"

  /** Mirror of text.tokenHash16: first 4 md5 hex digits as int. */
  def tokenHash16Sql(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 4))::INTEGER"

  /** Mirror of text.shingles(_, n) over a words column `w`. */
  def shinglesNSql(w: String, n: Int): String = {
    val parts = (0 until n)
      .map(k => if (k == 0) s"$w[i]" else s"$w[i+$k]")
      .mkString(" || ' ' || ")
    s"[$parts FOR i IN generate_series(1, len($w)-${n - 1})]"
  }

  /** Mirror of text.shingles(_, 3) over a words column `w`. */
  def shingles3Sql(w: String = "w"): String = shinglesNSql(w, 3)

  /** Mirror of vectors.cosine over two DOUBLE[] expressions. */
  def cosineSql(a: String, b: String): String =
    s"(list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))))"

  /** Marker-hit count: mirror of text.markerHits over a words column. */
  def markerHitsSql(w: String, markers: Seq[String]): String = {
    val lst = markers.map(m => s"'$m'").mkString("[", ", ", "]")
    s"len(list_filter($w, x -> list_contains($lst, x)))"
  }

  /** Mirror of graft.plans.BpeApply's fuse over symbol string `sym` with
    * the merge row aliased `b` (columns l, r): the EXACT left-to-right
    * non-overlapping fold at the symbol-array level. keep(i) marks fuse
    * starts — for l ≠ r every occurrence (occurrences are disjoint); for
    * a self-pair, positions with an EVEN count of consecutive l's before
    * them (run parity ≡ the greedy scan — a padded replace chain gets
    * self-runs ≥ 5 wrong, see the kernel's doc); position i + 1 of a
    * kept fuse is dropped. O(len²) via the nested prev-non-l
    * comprehension — oracle-side only; the engine runs the linear kernel.
    */
  def bpeFuseSql(sym: String): String = {
    val a = s"string_split($sym, ' ')"
    def keep(i: String) =
      s"($i < len($a) AND $a[$i] = b.l AND $a[$i + 1] = b.r AND" +
        s" (b.l <> b.r OR (($i - 1 - COALESCE(list_max(" +
        s"[j FOR j IN generate_series(1, $i - 1) IF $a[j] <> b.l])," +
        s" 0)) % 2 = 0)))"
    s"array_to_string(list_filter([CASE WHEN ${keep("i")} THEN b.l || b.r" +
      s" WHEN i > 1 AND ${keep("(i - 1)")} THEN NULL ELSE $a[i] END" +
      s" FOR i IN generate_series(1, len($a))], x -> x IS NOT NULL), ' ')"
  }

  /** Mirror of BpeTrain.learnMerges' k training rounds as CTE stages:
    * emits bt_n/bt_w/bt_wf/s0 (word-freq vocab symbolized) then
    * p$i/b$i/s$i per round. Callers splice this into a WITH list and
    * read the learned merges from b1..b$k (one row each: l, r, cnt) —
    * shared by the t15 train oracle and every encode-side oracle
    * (t21/p05), so train and apply replay IDENTICAL merge stages.
    */
  def bpeTrainStagesSql(k: Int): String = {
    val stages = (1 to k).map { i =>
      s"""p$i AS (SELECT a[x] AS l, a[x + 1] AS r, freq
         |  FROM (SELECT string_split(sym, ' ') AS a, freq,
         |          unnest(range(1, len(string_split(sym, ' ')))) AS x
         |        FROM s${i - 1})),
         |b$i AS (SELECT l, r, CAST(SUM(freq) AS BIGINT) AS cnt
         |        FROM p$i GROUP BY l, r
         |        ORDER BY cnt DESC, l, r LIMIT 1),
         |s$i AS (SELECT ${bpeFuseSql("sym")} AS sym, freq
         |  FROM s${i - 1}, b$i b)""".stripMargin
    }.mkString(",\n")
    s"""bt_n AS (SELECT $normSql AS norm FROM documents),
       |bt_w AS (SELECT unnest(${wordsSql()}) AS word FROM bt_n),
       |bt_wf AS (SELECT word, COUNT(*) AS freq FROM bt_w
       |          WHERE word <> '' GROUP BY word),
       |s0 AS (SELECT array_to_string(string_split(word, ''), ' ') AS sym,
       |         freq FROM bt_wf),
       |$stages""".stripMargin
  }

  /** Mirror of BpeTrain.applyMerges as CTE stages e1..e$k: replay the
    * learned b1..b$k (from [[bpeTrainStagesSql]]) in rank order over
    * e0(keyCols…, sym), each round the same [[bpeFuseSql]] fuse.
    */
  def bpeEncodeStagesSql(k: Int, keyCols: String): String =
    (1 to k).map { i =>
      s"""e$i AS (SELECT $keyCols, ${bpeFuseSql("sym")} AS sym
         |  FROM e${i - 1}, b$i b)""".stripMargin
    }.mkString(",\n")
}
