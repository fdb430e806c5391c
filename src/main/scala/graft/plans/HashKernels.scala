package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column
import org.apache.spark.unsafe.types.UTF8String

/** Native md5-prefix hash kernels for the dedup hot path.
  *
  * `text.saltedHash32` / `text.tokenHash16` are defined (and oracle-mirrored
  * in DuckDB) as "first N hex digits of md5(...) parsed base-16". The
  * built-in composition `conv(substring(md5(concat(...)), 1, N), 16, 10)`
  * computes the full 32-char hex string, substrings it, and re-parses it —
  * three UTF8String materializations per hash, ×8 salts per shingle on the
  * MinHash path. These kernels read the leading digest BYTES directly
  * (first 8 hex digits == first 4 bytes big-endian, unsigned), one digest
  * and zero intermediate strings per hash, fully codegen'd.
  */
case class Md5Prefix32(child: Expression, saltPrefix: String)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix32 expects string, got ${dt.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix32"

  @transient private lazy val saltBytes: Array[Byte] =
    saltPrefix.getBytes("UTF-8")

  override protected def nullSafeEval(s: Any): Any =
    HashKernels.md5Prefix32(saltBytes, s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("salt", saltBytes, "byte[]")
    defineCodeGen(ctx, ev, s => s"graft.plans.HashKernels.md5Prefix32($ref, $s)")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix32 =
    copy(child = newChild)
}

case class Md5Prefix64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix64 expects string, got ${dt.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix64"

  override protected def nullSafeEval(s: Any): Any =
    HashKernels.md5Prefix64(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.HashKernels.md5Prefix64($s)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix64 =
    copy(child = newChild)
}

case class Md5Prefix16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix16 expects string, got ${dt.sql}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "md5_prefix16"

  override protected def nullSafeEval(s: Any): Any =
    HashKernels.md5Prefix16(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.HashKernels.md5Prefix16($s)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix16 =
    copy(child = newChild)
}

object HashKernels {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private def digest(prefix: Array[Byte], s: UTF8String): Array[Byte] = {
    val md = digests.get()
    md.reset()
    if (prefix.length > 0) md.update(prefix)
    md.update(s.getBytes)
    md.digest()
  }

  /** Unsigned big-endian int of the first 4 md5 bytes of (prefix ++ s) —
    * equals `conv(substring(md5(...), 1, 8), 16, 10)::bigint`.
    */
  def md5Prefix32(prefix: Array[Byte], s: UTF8String): Long = {
    val d = digest(prefix, s)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** md5Prefix32 over a byte-range (no salt): hash of bytes[off, off+len). */
  def md5Prefix32Raw(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = digests.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Unsigned big-endian int of the first 2 md5 bytes of s — equals
    * `conv(substring(md5(s), 1, 4), 16, 10)::int`.
    */
  def md5Prefix16(s: UTF8String): Int = {
    val d = digest(Array.emptyByteArray, s)
    ((d(0) & 0xff) << 8) | (d(1) & 0xff)
  }

  /** Big-endian long of the first 8 md5 bytes of s (all 64 bits used —
    * the DuckDB mirror parses the first 16 hex digits as UBIGINT and
    * re-signs). */
  def md5Prefix64(s: UTF8String): Long = {
    val d = digest(Array.emptyByteArray, s)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** md5Prefix64 over a byte-range (no intermediate string). */
  def md5Prefix64Raw(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = digests.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  def saltedHash32(c: Column, salt: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      Md5Prefix32(org.apache.spark.sql.GraftBridge.expression(c), s"$salt:"))

  def tokenHash16(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      Md5Prefix16(org.apache.spark.sql.GraftBridge.expression(c)))

  def tokenHash64(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      Md5Prefix64(org.apache.spark.sql.GraftBridge.expression(c)))
}
