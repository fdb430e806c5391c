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
}
