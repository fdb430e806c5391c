package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis kernels for the training-data pipeline extensions
  * (BASELINE.json north star): normalization, tokenization, shingling,
  * heuristic language-ID, quality scoring, fingerprinting, SimHash.
  *
  * All pure `Column` compositions (built-in string/array/higher-order
  * functions) — distributed, codegen-friendly, no driver round-trips — and
  * each has an exact DuckDB-SQL equivalent for the oracle gate.
  */
object text {

  /** Lowercase, strip non-alphanumerics to spaces, squeeze runs, trim.
    * Native single-pass codegen kernel (graft.plans.NormText), byte-equal
    * to `trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "),
    * " +", " "))` — the regex form is what the DuckDB oracles mirror.
    */
  def normText(c: Column): Column = graft.plans.NormText.normText(c)

  /** Whitespace tokens of the normalized text. */
  def tokens(c: Column): Column = split(normText(c), " ")

  /** Token count (0 for empty/blank text). */
  def tokenCount(c: Column): Column =
    when(normText(c) === "", lit(0)).otherwise(size(tokens(c)))

  /** Word n-gram shingles joined with single spaces; empty array when the
    * document has fewer than n tokens.
    *
    * Implemented as n shifted `slice` views zipped together rather than
    * per-element `element_at(w, i+k)`: projection collapse inlines `w`
    * (split of two regex passes) into every consumer, so the index-based
    * form re-ran the whole normalization pipeline per shingle element —
    * O(tokens·n) regex evaluations per row. The slice form evaluates it
    * O(n) times per row (~40× faster on the documents table).
    */
  def shingles(c: Column, n: Int): Column = {
    val w = tokens(c)
    val viewLen = size(w) - (n - 1)
    val shifted = (0 until n).map(k => slice(w, lit(k + 1), viewLen))
    val zipped = shifted.reduce((acc, nxt) =>
      zip_with(acc, nxt, (a, b) => concat_ws(" ", a, b)))
    when(size(w) >= n, zipped).otherwise(array().cast("array<string>"))
  }

  /** Count of tokens that appear in a fixed marker vocabulary.
    * Native codegen kernel (graft.plans.CountInVocab), equivalent to
    * `size(filter(tokens(c), t => array_contains(m, t)))` — occurrence
    * count, no dedup. The `filter` HOF form is interpreted and blocks
    * whole-stage codegen; the kernel keeps the langId score chain inside
    * one codegen stage with a shared normalized-text subexpression.
    */
  def markerHits(c: Column, markers: Seq[String]): Column =
    graft.plans.CountInVocab.countInVocab(normText(c), markers)

  /** Heuristic n-gram language-ID: score each candidate class by marker-
    * vocabulary hits, pick the argmax (first wins on ties, in `classes`
    * order). Returns the class name, or "und" when no marker hits at all.
    */
  def langId(c: Column, classes: Seq[(String, Seq[String])]): Column = {
    val scores = classes.map { case (name, markers) => name -> markerHits(c, markers) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((name, s), el) =>
      when(s === best && best > 0, lit(name)).otherwise(el)
    }
  }

  /** Exact-dup fingerprint: md5 hex of the normalized text. */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** BPE-ish regex tokenization count: letter runs, digit runs, symbol
    * runs (whitespace separates, never counts). The class set is chosen so
    * Java regex and RE2 (DuckDB) agree byte-for-byte.
    */
  val BpeTokenPattern: String = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\f\\r]+"
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpeTokenPattern), lit(0)))

  /** Winnowing document fingerprints (rolling k-gram hash + sliding-window
    * minimum, Schleimer et al. SIGMOD'03) over the normalized text; native
    * kernel graft.plans.WinnowFingerprints. Returns array<bigint> of the
    * distinct selected gram hashes.
    */
  def winnowFingerprints(c: Column, k: Int, w: Int): Column =
    graft.plans.WinnowFingerprints.winnow(normText(c), k, w)

  /** 16-bit token hash: first 4 hex digits of md5, as int (0..65535).
    * Native digest-prefix kernel (graft.plans.Md5Prefix16), value-equal to
    * `conv(substring(md5(c), 1, 4), 16, 10).cast("int")`.
    */
  def tokenHash16(c: Column): Column = graft.plans.HashKernels.tokenHash16(c)

  /** 32-bit salted shingle hash for MinHash: first 8 hex digits of
    * md5(salt || ":" || shingle) as bigint (0..2^32-1). Native digest-
    * prefix kernel (graft.plans.Md5Prefix32), value-equal to
    * `conv(substring(md5(concat(lit(s"$salt:"), c)), 1, 8), 16, 10)`.
    */
  def saltedHash32(c: Column, salt: Int): Column =
    graft.plans.HashKernels.saltedHash32(c, salt)

  /** JVM-side twin of [[saltedHash32]] — for serial replays in specs
    * and driver-side parity checks.
    */
  def saltedHash32Long(s: String, salt: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt:$s".getBytes("UTF-8"))
    d.take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
  }

  /** Hashed-linear quality score — the inference half of a
    * fastText/CCNet-style linear document classifier: each DISTINCT
    * token hashes into one of `weights.size` buckets
    * (tokenHash16 mod buckets — the hashing trick, collisions and
    * all), and the score is the integer sum of the bucket weights.
    * The weight vector is the trained model: a bounded driver-held
    * constant (like an IVF codebook) embedded as an array literal, so
    * inference is a pure per-row expression — no join, no shuffle, no
    * UDF; at 100 TB the filter runs at scan speed alongside the other
    * per-row hygiene kernels (t03/t09). Distinct-token (set-of-words)
    * semantics make the score length-robust: repeating one spammy
    * token doesn't scale its weight. Integer weights keep the score
    * exact and order-free (overflow-safe: |score| ≤ 65536·max|w|).
    */
  def hashedLinearScore(c: Column, weights: Seq[Int]): Column = {
    require(weights.nonEmpty, "need a non-empty weight vector")
    val w = array(weights.map(v => lit(v)): _*)
    aggregate(
      array_distinct(filter(tokens(c), t => t =!= "")),
      lit(0L),
      (acc, t) =>
        acc + element_at(w, pmod(tokenHash16(t), lit(weights.size)) + 1)
          .cast("long"))
  }

  /** PII patterns for corpus redaction (the CCNet/Pile-style scrub pass
    * before training). Deliberately the COMMON regex subset — ASCII
    * classes, bounded quantifiers, `\b`, no lookaround/backreferences —
    * identical leftmost-longest-free semantics under both Java regex
    * (Spark codegen'd regexp_replace) and RE2 (DuckDB/Go), so the scrub
    * is oracle-matchable cross-engine. `[0-9]` not `\d` (RE2's `\d` is
    * ASCII-only, Java's is Unicode-aware under UNICODE_CHARACTER_CLASS —
    * dodge the difference entirely).
    */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern: String =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePattern: String = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** Occurrences of `pattern` in `c` (match-count evidence column — a
    * scrub report needs what was removed, not just the cleaned text).
    */
  def piiCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  /** Redact emails → `<EMAIL>`, IPv4s → `<IP>`, NANP-style phones →
    * `<PHONE>`. Fixed order (email first: its domain may contain
    * digit-dot runs an IP pattern could bite into); placeholders are
    * digit-free so later passes can't re-match earlier replacements.
    * Pure per-row codegen'd expressions — scales with partitions, no
    * shuffle, no UDF.
    */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** Fused scrub + report: `struct(scrubbed, n_emails, n_ips,
    * n_phones)` in ONE kernel evaluation (graft.plans.PiiScrub) —
    * value-equal to `(scrubPii(c), piiCount(c, EmailPattern), ...)`,
    * which evaluates `c` four times and runs six regex-engine passes.
    * Parity with the regex forms is spec-pinned (PiiScrubSpec).
    */
  def piiScrubReport(c: Column): Column = graft.plans.PiiScrub.piiScrub(c)
}
