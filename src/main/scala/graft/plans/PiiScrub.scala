package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column
import org.apache.spark.unsafe.types.UTF8String

/** Fused PII scrub + report: one expression evaluation yields
  * `struct(scrubbed, n_emails, n_ips, n_phones)` — replacing FOUR
  * consumers of the enriched text (3× `size(regexp_extract_all(...))` +
  * a 3-deep `regexp_replace` chain), each of which re-evaluated the
  * input expression and ran its own regex-engine pass with
  * backtracking and match-array materialization. Byte-exact to the
  * `text.piiCount`/`text.scrubPii` forms (the DuckDB oracle mirrors
  * those), pinned by the PiiScrub parity spec over adversarial inputs:
  *
  *   - counts are matches of each pattern on the ORIGINAL text
  *     (= `regexp_extract_all` on the raw column);
  *   - `scrubbed` is the CHAINED replacement — email first, then IPv4
  *     over that result, then phone over that — which can legitimately
  *     differ from original-text matches at word boundaries (a
  *     replaced `<EMAIL>`'s `>` creates a `\b` the original text
  *     lacked), so the kernel runs the count walks and the replace
  *     walks on exactly the buffers the two `Column` forms see.
  *
  * The patterns (text.EmailPattern / Ipv4Pattern / PhonePattern) are
  * pure ASCII with bounded greedy quantifiers and no alternation, so
  * Java-regex leftmost/greedy/backtracking semantics reduce to
  * deterministic maximal-run scans (see each scanner's notes); the
  * kernel is a handful of branch-per-byte walks, no regex engine, no
  * intermediate match arrays. Multi-byte UTF-8 is safe byte-wise for
  * the ASCII character classes (continuation bytes are >= 0x80, which
  * every class rejects), but NOT for `\b`: Java's word-boundary test
  * is Unicode-aware even without UNICODE_CHARACTER_CLASS
  * (`ch == '_' || Character.isLetterOrDigit(ch)` — `é` and `東` are
  * word chars), so the boundary checks decode the single adjacent
  * codepoint and apply exactly that predicate (caught by the parity
  * spec's unicode-neighbour cases). MALFORMED UTF-8 rows take a rare
  * sanitize path: the regex forms decode-with-replacement and re-encode
  * unconditionally, so the kernel detects invalid bytes up front and
  * runs every walk on the same U+FFFD-sanitized buffer the regex engine
  * sees (parity-spec-pinned on overlong/surrogate/truncated inputs).
  *
  * 100 TB story: a pure per-row projection — scales with partitions,
  * no shuffle, no UDF, stays inside whole-stage codegen.
  */
case class PiiScrub(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"pii_scrub expects string, got ${dt.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("scrubbed", StringType, nullable = false),
    StructField("n_emails", IntegerType, nullable = false),
    StructField("n_ips", IntegerType, nullable = false),
    StructField("n_phones", IntegerType, nullable = false)))
  override def prettyName: String = "pii_scrub"

  override protected def nullSafeEval(s: Any): Any =
    PiiScrub.kernel(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.PiiScrub.kernel($s)")

  override protected def withNewChildInternal(newChild: Expression): PiiScrub =
    copy(child = newChild)
}

object PiiScrub {

  private val Email = "<EMAIL>".getBytes
  private val Ip = "<IP>".getBytes
  private val Phone = "<PHONE>".getBytes

  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline private def isAlpha(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
  @inline private def isWordAscii(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '_'

  /** Decode the codepoint whose LEAD byte is at `s`, STRICTLY: a
    * malformed sequence — truncated, bad continuation byte, overlong
    * encoding (e.g. 0xC1 0xA1, which would otherwise decode to 'a', a
    * word char), surrogate range, or beyond U+10FFFF — yields 0xFFFD,
    * a non-letter. That matches what the regex Column forms see: the
    * UTF8String.toString decode replaces every malformed sequence with
    * U+FFFD (possibly several), and the adjacent char the `\b` test
    * inspects is then a replacement char — non-word — however many
    * FFFDs the full decode would produce.
    */
  private def codePointAt(b: Array[Byte], s: Int): Int = {
    @inline def cont(i: Int): Boolean =
      i < b.length && (b(i) & 0xc0) == 0x80
    val b0 = b(s) & 0xff
    if (b0 < 0x80) b0
    else if ((b0 & 0xe0) == 0xc0) {
      if (!cont(s + 1)) 0xFFFD
      else {
        val cp = ((b0 & 0x1f) << 6) | (b(s + 1) & 0x3f)
        if (cp < 0x80) 0xFFFD else cp // overlong (0xC0/0xC1 leads)
      }
    } else if ((b0 & 0xf0) == 0xe0) {
      if (!cont(s + 1) || !cont(s + 2)) 0xFFFD
      else {
        val cp = ((b0 & 0x0f) << 12) | ((b(s + 1) & 0x3f) << 6) |
          (b(s + 2) & 0x3f)
        if (cp < 0x800 || (cp >= 0xD800 && cp <= 0xDFFF)) 0xFFFD else cp
      }
    } else if ((b0 & 0xf8) == 0xf0) {
      if (!cont(s + 1) || !cont(s + 2) || !cont(s + 3)) 0xFFFD
      else {
        val cp = ((b0 & 0x07) << 18) | ((b(s + 1) & 0x3f) << 12) |
          ((b(s + 2) & 0x3f) << 6) | (b(s + 3) & 0x3f)
        if (cp < 0x10000 || cp > 0x10FFFF) 0xFFFD else cp
      }
    } else 0xFFFD
  }

  /** Java `\b` word test for the char immediately BEFORE byte `pos`
    * (false at the string start). ASCII fast path; otherwise walk back
    * over continuation bytes and decode.
    */
  private def wordBefore(b: Array[Byte], pos: Int): Boolean = {
    if (pos == 0) return false
    val prev = b(pos - 1)
    if (prev >= 0) isWordAscii(prev)
    else {
      var s = pos - 1
      while (s > 0 && (b(s) & 0xc0) == 0x80) s -= 1
      Character.isLetterOrDigit(codePointAt(b, s))
    }
  }

  /** Java `\b` word test for the char STARTING at byte `pos` (false at
    * the string end).
    */
  private def wordAt(b: Array[Byte], pos: Int): Boolean = {
    if (pos >= b.length) return false
    val c = b(pos)
    if (c >= 0) isWordAscii(c)
    else Character.isLetterOrDigit(codePointAt(b, pos))
  }
  /** Email local-part class [A-Za-z0-9._%+-]. */
  @inline private def isL(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '.' || b == '_' || b == '%' ||
      b == '+' || b == '-'
  /** Email domain class [A-Za-z0-9.-]. */
  @inline private def isD(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '.' || b == '-'

  /** Growable byte sink used only when a buffer actually has a match. */
  private final class Sink(cap: Int) {
    var buf = new Array[Byte](math.max(cap, 16))
    var n = 0
    def append(src: Array[Byte], from: Int, until: Int): Unit = {
      val len = until - from
      ensure(len)
      System.arraycopy(src, from, buf, n, len)
      n += len
    }
    def appendAll(src: Array[Byte]): Unit = append(src, 0, src.length)
    private def ensure(len: Int): Unit =
      if (n + len > buf.length) {
        val grown = new Array[Byte](math.max(buf.length * 2, n + len))
        System.arraycopy(buf, 0, grown, 0, n)
        buf = grown
      }
  }

  /** One email pass: Java-regex equivalent of
    * `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`.
    *
    * Leftmost/greedy reduction: a match's local part is a maximal
    * L-run whose terminating byte is '@' (greedy `+` cannot stop
    * before a char of its own class, and no start inside a failed run
    * can succeed — it meets the same '@' and domain); the domain is
    * the maximal D-run after '@', backtracked from the RIGHTMOST '.'
    * (greedy `[A-Za-z0-9.-]+` yields one char at a time from the
    * longest form) whose suffix opens with >= 2 letters; the TLD is
    * that maximal letter run. On domain failure scanning resumes
    * right after the '@' (domain bytes may restart a later match).
    *
    * Returns the match count; when `out` is non-null also copies the
    * scrubbed bytes into it.
    */
  private def emailPass(b: Array[Byte], out: Sink): Int = {
    val len = b.length
    var count = 0
    var copyFrom = 0
    var i = 0
    while (i < len) {
      if (isL(b(i))) {
        val runStart = i
        var j = i
        while (j < len && isL(b(j))) j += 1
        if (j < len && b(j) == '@') {
          val dStart = j + 1
          var k = dStart
          while (k < len && isD(b(k))) k += 1
          // rightmost '.' with a >=2-letter suffix; D+ before it nonempty
          var matchEnd = -1
          var p = k - 1
          while (matchEnd < 0 && p >= dStart + 1) {
            if (b(p) == '.') {
              var q = p + 1
              while (q < len && isAlpha(b(q))) q += 1
              if (q - p - 1 >= 2) matchEnd = q
            }
            p -= 1
          }
          if (matchEnd > 0) {
            count += 1
            if (out != null) {
              out.append(b, copyFrom, runStart)
              out.appendAll(Email)
              copyFrom = matchEnd
            }
            i = matchEnd
          } else {
            i = dStart
          }
        } else {
          i = j
        }
      } else i += 1
    }
    if (out != null) out.append(b, copyFrom, len)
    count
  }

  /** One IPv4 pass: `\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b`.
    * Greedy `{1,3}` with a mandatory `\.`/`\b` successor reduces to
    * all-or-nothing digit runs: each of the first three octets must be
    * a FULL digit run of length 1..3 followed by '.', and the last a
    * full run of length 1..3 followed by a non-word byte or the end
    * (any shorter take leaves a digit — a word char — next, failing
    * both `\.` and `\b`). Starts need a word boundary; on failure the
    * scan advances one byte (a later start inside the probed region
    * can still match, e.g. `1234.5.6.7.8` → `5.6.7.8`).
    */
  private def ipPass(b: Array[Byte], out: Sink): Int = {
    val len = b.length
    var count = 0
    var copyFrom = 0
    var i = 0
    while (i < len) {
      if (isDigit(b(i)) && !wordBefore(b, i)) {
        var p = i
        var ok = true
        var oct = 0
        while (ok && oct < 4) {
          val rs = p
          while (p < len && isDigit(b(p))) p += 1
          val rl = p - rs
          if (rl < 1 || rl > 3) ok = false
          else if (oct < 3) {
            if (p < len && b(p) == '.') p += 1 else ok = false
          } else if (wordAt(b, p)) ok = false
          oct += 1
        }
        if (ok) {
          count += 1
          if (out != null) {
            out.append(b, copyFrom, i)
            out.appendAll(Ip)
            copyFrom = p
          }
          i = p
        } else i += 1
      } else i += 1
    }
    if (out != null) out.append(b, copyFrom, len)
    count
  }

  /** One phone pass: `\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b`. Fixed counts:
    * the first two digit groups must be runs of EXACTLY 3 (a longer
    * run puts a digit where '-' must be) and the last exactly 4
    * followed by a non-word byte or the end.
    */
  private def phonePass(b: Array[Byte], out: Sink): Int = {
    val len = b.length
    var count = 0
    var copyFrom = 0
    var i = 0
    while (i < len) {
      if (isDigit(b(i)) && !wordBefore(b, i)) {
        var p = i
        var ok = true
        var g = 0
        while (ok && g < 3) {
          val rs = p
          while (p < len && isDigit(b(p))) p += 1
          val rl = p - rs
          val want = if (g == 2) 4 else 3
          if (rl != want) ok = false
          else if (g < 2) {
            if (p < len && b(p) == '-') p += 1 else ok = false
          } else if (wordAt(b, p)) ok = false
          g += 1
        }
        if (ok) {
          count += 1
          if (out != null) {
            out.append(b, copyFrom, i)
            out.appendAll(Phone)
            copyFrom = p
          }
          i = p
        } else i += 1
      } else i += 1
    }
    if (out != null) out.append(b, copyFrom, len)
    count
  }

  /** True iff `b` is well-formed UTF-8: no truncated sequence, bad
    * continuation byte, overlong form, surrogate, or > U+10FFFF.
    * Branch-per-byte with an ASCII fast path — cheap relative to the
    * pattern walks.
    */
  private def isValidUtf8(b: Array[Byte]): Boolean = {
    val len = b.length
    var i = 0
    while (i < len) {
      val b0 = b(i) & 0xff
      if (b0 < 0x80) i += 1
      else {
        val n =
          if ((b0 & 0xe0) == 0xc0) 2
          else if ((b0 & 0xf0) == 0xe0) 3
          else if ((b0 & 0xf8) == 0xf0) 4
          else return false
        if (i + n > len) return false
        var k = i + 1
        while (k < i + n) {
          if ((b(k) & 0xc0) != 0x80) return false
          k += 1
        }
        val cp =
          if (n == 2) ((b0 & 0x1f) << 6) | (b(i + 1) & 0x3f)
          else if (n == 3) ((b0 & 0x0f) << 12) | ((b(i + 1) & 0x3f) << 6) |
            (b(i + 2) & 0x3f)
          else ((b0 & 0x07) << 18) | ((b(i + 1) & 0x3f) << 12) |
            ((b(i + 2) & 0x3f) << 6) | (b(i + 3) & 0x3f)
        val minCp = if (n == 2) 0x80 else if (n == 3) 0x800 else 0x10000
        if (cp < minCp || cp > 0x10FFFF ||
          (cp >= 0xD800 && cp <= 0xDFFF)) return false
        i += n
      }
    }
    true
  }

  /** Count on a buffer without building output (cheap pre-walk); the
    * replace walk runs only when the count says something matched, so
    * clean rows — the overwhelming majority of a real corpus — do two
    * branch-per-byte walks per pattern and zero copies.
    */
  def kernel(s: UTF8String): InternalRow = {
    val raw = s.getBytes
    // Rare path: malformed UTF-8. EVERY regex Column form decodes to a
    // java.lang.String (malformed sequences → U+FFFD replacement chars)
    // and re-encodes its result — even a zero-match regexp_replace
    // rewrites malformed bytes — so byte-parity requires running every
    // walk on the SAME sanitized bytes the regex engine sees. (This
    // also keeps the \b checks honest: an overlong 0xC1 0xA1 would
    // otherwise decode here to 'a', a word char, where the regex sees
    // the non-word U+FFFD — the boundary divergence PiiScrubSpec's
    // malformed-input cases pin.)
    val orig = if (isValidUtf8(raw)) raw
      else s.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // counts are always on the ORIGINAL text
    val nEmails = emailPass(orig, null)
    val nIps = ipPass(orig, null)
    val nPhones = phonePass(orig, null)
    // chained replacement: email -> ip -> phone, each on the previous
    // pass's output (matching the 3-deep regexp_replace exactly)
    var cur = orig
    if (nEmails > 0) {
      val out = new Sink(cur.length + 8)
      emailPass(cur, out)
      cur = java.util.Arrays.copyOf(out.buf, out.n)
    }
    if (ipPass(cur, null) > 0) {
      val out = new Sink(cur.length + 8)
      ipPass(cur, out)
      cur = java.util.Arrays.copyOf(out.buf, out.n)
    }
    if (phonePass(cur, null) > 0) {
      val out = new Sink(cur.length + 8)
      phonePass(cur, out)
      cur = java.util.Arrays.copyOf(out.buf, out.n)
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromBytes(cur), nEmails, nIps, nPhones))
  }

  def piiScrub(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      PiiScrub(org.apache.spark.sql.GraftBridge.expression(c)))
}
