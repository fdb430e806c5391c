package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd text kernels replacing the regex/higher-order
  * pipelines on the documents hot path.
  *
  * `NormText` is byte-for-byte equivalent to
  * `trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))`:
  * every non-[a-z0-9] character maps to a space and space runs collapse,
  * so replacing one multi-byte character with several byte-level spaces
  * yields the same squeezed output — a single pass, no regex engine, no
  * intermediate strings.
  *
  * `CountInVocab` is equivalent to
  * `size(filter(split(norm, " "), t => array_contains(vocab, t)))` over an
  * already-normalized string — counts every occurrence (no dedup), walks
  * the bytes without materializing the token array. `filter` is a
  * higher-order function, which Spark evaluates interpreted and which
  * blocks whole-stage codegen for the enclosing projection; this kernel
  * restores codegen (and with it codegen-level common-subexpression
  * elimination across the language-ID score chain).
  */
case class NormText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"norm_text expects string, got ${dt.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "norm_text"

  override protected def nullSafeEval(s: Any): Any =
    NormText.kernel(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.NormText.kernel($s)")

  override protected def withNewChildInternal(newChild: Expression): NormText =
    copy(child = newChild)
}

object NormText {
  def kernel(s: UTF8String): UTF8String = {
    val in = s.toLowerCase.getBytes
    val out = new Array[Byte](in.length)
    var n = 0
    var pendingSpace = false
    var i = 0
    while (i < in.length) {
      val b = in(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pendingSpace && n > 0) { out(n) = ' '; n += 1 }
        pendingSpace = false
        out(n) = b; n += 1
      } else {
        pendingSpace = true
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, n)
  }

  def normText(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      NormText(org.apache.spark.sql.GraftBridge.expression(c)))
}

/** Winnowing fingerprint selection (Schleimer, Schmoe & Aiken, SIGMOD'03):
  * hash every k-char gram of the (already-normalized, ASCII) text, slide a
  * window of `w` consecutive gram hashes, keep each window's minimum.
  * Returns the distinct selected hashes (unsorted). Hash = first 4 md5
  * bytes of the gram, matching `text.saltedHash32`'s oracle convention so
  * DuckDB can mirror it with a list comprehension.
  *
  * The per-row cost is O(len·k) digesting + O(len) monotone-deque window
  * minima; no shuffle — fingerprints distribute with the row.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
  extends UnaryExpression {
  require(k >= 1 && w >= 1)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"winnow expects string, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow"

  override protected def nullSafeEval(s: Any): Any =
    WinnowFingerprints.kernel(s.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.plans.WinnowFingerprints.kernel($s, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  def kernel(s: UTF8String, k: Int, w: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = s.getBytes
    val nGrams = bytes.length - k + 1
    if (nGrams < 1) return org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(Array.emptyLongArray)
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      hashes(i) = HashKernels.md5Prefix32Raw(bytes, i, k)
      i += 1
    }
    // Sliding-window minima via monotone deque; collect distinct picks.
    val win = math.min(w, nGrams)
    val deque = new Array[Int](nGrams)
    var head = 0; var tail = 0
    val picked = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i < nGrams) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - win) head += 1
      if (i >= win - 1) picked.add(hashes(deque(head)))
      i += 1
    }
    val out = new Array[Long](picked.size)
    val it = picked.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  def winnow(c: Column, k: Int, w: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      WinnowFingerprints(org.apache.spark.sql.GraftBridge.expression(c), k, w))
}

/** 16-bit SimHash of an already-normalized document in one pass: hash
  * every space-separated token (first 2 md5 bytes, = text.tokenHash16),
  * vote each bit +1/−1, set result bits where the vote is positive.
  *
  * Semantics mirror the explode→tokenHash16→16×SUM(CASE)→recombine
  * pipeline in operators.Dedup (and the d03 DuckDB oracle), including the
  * empty-document edge: `split("", " ")` yields one empty token, so an
  * empty norm votes with md5("")'s bits. As a per-row expression the
  * signature computation needs NO shuffle — the exploded form multiplies
  * rows by token count and shuffles them back by doc id.
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash16 expects string, got ${dt.sql}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "simhash16"

  override protected def nullSafeEval(s: Any): Any =
    SimHash16.kernel(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.SimHash16.kernel($s)")

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

/** 64-bit SimHash over an already-normalized document — the
  * production-size signature (16 bits is a demonstration size: its 4-bit
  * bands have only 16 bucket values, so buckets grow linearly with the
  * corpus; 64 bits band into 4×16-bit bands with 65536 values each while
  * keeping the same guaranteed recall at hamming ≤ 3). Token hash = first
  * 8 md5 bytes big-endian (= HashKernels.md5Prefix64); same per-row
  * no-shuffle shape and empty-token semantics as [[SimHash16]].
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects string, got ${dt.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(s: Any): Any =
    SimHash64.kernel(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.SimHash64.kernel($s)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def kernel(s: UTF8String): Long = {
    val bytes = s.getBytes
    val votes = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i > start || bytes.length == 0) {
          val h = HashKernels.md5Prefix64Raw(bytes, start, i - start)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sim |= 1L << b; b += 1 }
    sim
  }

  def simhash64(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      SimHash64(org.apache.spark.sql.GraftBridge.expression(c)))
}

object SimHash16 {
  def kernel(s: UTF8String): Int = {
    val bytes = s.getBytes
    val votes = new Array[Int](16)
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        // empty segments only occur for the fully-empty input, which
        // split("", " ") maps to one empty token — vote it like the
        // exploded pipeline does
        if (i > start || bytes.length == 0) {
          val h = HashKernels.md5Prefix32Raw(bytes, start, i - start).toInt >>> 16
          var b = 0
          while (b < 16) {
            if (((h >> b) & 1) == 1) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var sim = 0
    var b = 0
    while (b < 16) { if (votes(b) > 0) sim |= 1 << b; b += 1 }
    sim
  }

  def simhash16(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      SimHash16(org.apache.spark.sql.GraftBridge.expression(c)))
}

/** Per-row MinHash + shingle-set kernel over an already-normalized
  * (single-space-joined, ASCII) document: word n-gram shingles are plain
  * byte ranges of the input, so the kernel hashes `k` salted variants of
  * each range directly — no token explosion, no window, no groupBy; the
  * whole signature computation distributes with the row.
  *
  * Returns null when the document has fewer than `n` tokens (no
  * shingles), else a struct of:
  *   mins: array<bigint> — per-salt minimum of md5-prefix32("j:"+shingle)
  *         over ALL shingle occurrences (same values as aggregating
  *         text.saltedHash32 over exploded shingle rows),
  *   sh:   array<string> — distinct shingles, first-occurrence order
  *         (same set as array_distinct(collect_list(...))),
  *   n:    int — total (non-distinct) shingle count = tokens − n + 1.
  */
case class MinHashShingles(child: Expression, k: Int, n: Int)
  extends UnaryExpression {
  require(k >= 1 && n >= 1)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_shingles expects string, got ${dt.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("mins", ArrayType(LongType, containsNull = false)),
    StructField("sh", ArrayType(StringType, containsNull = false)),
    StructField("n", IntegerType)))
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_shingles"

  override protected def nullSafeEval(s: Any): Any =
    MinHashShingles.kernel(s.asInstanceOf[UTF8String], k, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val row = ctx.freshName("mhRow")
      s"""
       org.apache.spark.sql.catalyst.InternalRow $row =
         graft.plans.MinHashShingles.kernel($c, $k, $n);
       if ($row == null) { ${ev.isNull} = true; } else { ${ev.value} = $row; }
       """
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashShingles =
    copy(child = newChild)
}

object MinHashShingles {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val saltCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()

  private def saltsFor(k: Int): Array[Array[Byte]] =
    saltCache.computeIfAbsent(k,
      kk => (1 to kk).map(j => s"$j:".getBytes("UTF-8")).toArray)

  def kernel(s: UTF8String, k: Int, n: Int): InternalRow = {
    val bytes = s.getBytes
    // token start offsets (norm is single-space separated, no empties
    // except the fully-empty string)
    if (bytes.length == 0) return null
    var tokens = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') tokens += 1; i += 1 }
    val nShingles = tokens - n + 1
    if (nShingles < 1) return null
    val starts = new Array[Int](tokens + 1)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(tokens) = bytes.length + 1
    val salts = saltsFor(k)
    val mins = Array.fill(k)(Long.MaxValue)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val md = digests.get()
    var sIdx = 0
    while (sIdx < nShingles) {
      val from = starts(sIdx)
      val until = starts(sIdx + n) - 1 // drop the trailing separator
      val len = until - from
      var j = 0
      while (j < k) {
        md.reset()
        md.update(salts(j))
        md.update(bytes, from, len)
        val d = md.digest()
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      seen.add(UTF8String.fromBytes(bytes, from, len))
      sIdx += 1
    }
    val sh = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { sh(o) = it.next(); o += 1 }
    new GenericInternalRow(Array[Any](
      ArrayData.toArrayData(mins), new GenericArrayData(sh), nShingles))
  }

  def minhashShingles(c: Column, k: Int, n: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      MinHashShingles(org.apache.spark.sql.GraftBridge.expression(c), k, n))
}

case class CountInVocab(child: Expression, vocab: Seq[String])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"count_in_vocab expects string, got ${dt.sql}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_in_vocab"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](vocab.size * 2)
    vocab.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }

  override protected def nullSafeEval(s: Any): Any =
    CountInVocab.kernel(s.asInstanceOf[UTF8String], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocab", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, s => s"graft.plans.CountInVocab.kernel($s, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInVocab =
    copy(child = newChild)
}

object CountInVocab {
  /** Space-splitting occurrence count; safe on any UTF-8 (0x20 never
    * appears inside a multi-byte sequence). Empty segments don't count.
    */
  def kernel(s: UTF8String, vocab: java.util.HashSet[UTF8String]): Int = {
    val bytes = s.getBytes
    var count = 0
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i > start &&
            vocab.contains(UTF8String.fromBytes(bytes, start, i - start)))
          count += 1
        start = i + 1
      }
      i += 1
    }
    count
  }

  def countInVocab(c: Column, vocab: Seq[String]): Column =
    org.apache.spark.sql.GraftBridge.column(
      CountInVocab(org.apache.spark.sql.GraftBridge.expression(c), vocab))
}

/** Per-row n-gram repetition statistics over an already-normalized
  * (single-space-joined, ASCII) document — the counting complement to
  * [[MinHashShingles]] (whose distinct-set output discards occurrence
  * counts): total shingles, distinct shingles, and the count of the most
  * frequent shingle, in ONE pass with a per-row hash map. Replaces the
  * posexplode→window→two-aggregation long form for the Gopher-style
  * repetition filters, which shuffled every (doc, gram) occurrence row
  * (~2M rows at sf0.1) just to count them; with this kernel the stats
  * distribute with the row and the query is a pure projection.
  *
  * Null when the document has fewer than `n` tokens (no shingles) —
  * mirroring the long form, which emits no row for such docs.
  */
case class ShingleStats(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"shingle_stats expects string, got ${dt.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType),
    StructField("n_distinct", LongType),
    StructField("top_cnt", LongType)))
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_stats"

  override protected def nullSafeEval(s: Any): Any =
    ShingleStats.kernel(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val row = ctx.freshName("ssRow")
      s"""
       org.apache.spark.sql.catalyst.InternalRow $row =
         graft.plans.ShingleStats.kernel($c, $n);
       if ($row == null) { ${ev.isNull} = true; } else { ${ev.value} = $row; }
       """
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleStats =
    copy(child = newChild)
}

object ShingleStats {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  def kernel(s: UTF8String, n: Int): InternalRow = {
    val bytes = s.getBytes
    if (bytes.length == 0) return null
    // token start offsets (norm is single-space separated, no empties
    // except the fully-empty string) — same walk as MinHashShingles
    var tokens = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') tokens += 1; i += 1 }
    val nShingles = tokens - n + 1
    if (nShingles < 1) return null
    val starts = new Array[Int](tokens + 1)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(tokens) = bytes.length + 1
    val counts = new java.util.HashMap[UTF8String, Integer](nShingles * 2)
    var top = 0
    var sIdx = 0
    while (sIdx < nShingles) {
      val from = starts(sIdx)
      val len = starts(sIdx + n) - 1 - from // drop the trailing separator
      val sh = UTF8String.fromBytes(bytes, from, len)
      val c = counts.merge(sh, 1, (a, b) => a + b)
      if (c > top) top = c
      sIdx += 1
    }
    new GenericInternalRow(Array[Any](
      nShingles.toLong, counts.size.toLong, top.toLong))
  }

  def shingleStats(c: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      ShingleStats(org.apache.spark.sql.GraftBridge.expression(c), n))
}
