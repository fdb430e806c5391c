package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column
import org.apache.spark.unsafe.types.UTF8String

/** BPE merge replay over a space-joined symbol string — the ONE fuse
  * both training ([[graft.operators.BpeTrain.learnMerges]]) and encode
  * ([[graft.operators.BpeTrain.encode]]) run: each merge (l, r), in rank
  * order, fused left-to-right non-overlapping as the EXACT serial fold
  * (scan the symbol array once; at each position fuse iff the pair
  * matches and the left symbol wasn't consumed by the previous fuse).
  *
  * Why a kernel and not string `replace`: a padded two-pass
  * `replace(' l r ', ' lr ')` chain — the operator's original form — is
  * NOT the fold for runs of a self-pair (l = r). Each match consumes its
  * trailing delimiter space, so in `a a a a a` the scan skips the third
  * `a` and fuses (1,2)(4,5) where the fold fuses (1,2)(3,4); from runs
  * of 5 the token ORDER diverges and from runs of 9 the token MULTISET
  * does ((aa,a,aa,a,aa,a) vs the fold's (aa,aa,aa,aa,a) — caught by
  * BpeTrainSpec's run-parity cases). No replace-pass count fixes it
  * (mispaired symbols can never re-pair), and RE2 (the oracle engine's
  * regex) has no lookahead to leave the delimiter unconsumed — so both
  * engines implement the fold at the SYMBOL-ARRAY level: this kernel
  * here, a list-comprehension mirror (SqlMacros.bpeFuseSql) in DuckDB.
  *
  * All merges apply in ONE pass per row (k serial folds over an
  * in-register array — no k-deep replace chain, no intermediate
  * strings), inside whole-stage codegen via `addReferenceObj`; the merge
  * table is a driver-held bounded constant, so 100 TB encode stays a
  * zero-shuffle per-row map.
  */
case class BpeApply(child: Expression, lhs: Seq[String], rhs: Seq[String])
  extends UnaryExpression {
  require(lhs.length == rhs.length, "lhs/rhs merge columns must align")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bpe_apply expects string, got ${dt.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_apply"

  private lazy val lArr: Array[String] = lhs.toArray
  private lazy val rArr: Array[String] = rhs.toArray

  override protected def nullSafeEval(s: Any): Any =
    BpeApply.kernel(s.asInstanceOf[UTF8String], lArr, rArr)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("bpeLhs", lArr, "java.lang.String[]")
    val r = ctx.addReferenceObj("bpeRhs", rArr, "java.lang.String[]")
    defineCodeGen(ctx, ev, s => s"graft.plans.BpeApply.kernel($s, $l, $r)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApply =
    copy(child = newChild)
}

object BpeApply {

  /** Replay every merge in order; each is one exact left-to-right
    * non-overlapping fold over the symbol array.
    */
  def kernel(s: UTF8String, lhs: Array[String],
             rhs: Array[String]): UTF8String = {
    val str = s.toString
    if (str.isEmpty || lhs.length == 0) return s
    var syms: Array[String] = str.split(" ")
    var m = 0
    while (m < lhs.length && syms.length > 1) {
      val l = lhs(m)
      val r = rhs(m)
      var n = 0
      var i = 0
      val out = new Array[String](syms.length)
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          out(n) = l + r
          i += 2
        } else {
          out(n) = syms(i)
          i += 1
        }
        n += 1
      }
      syms = if (n == syms.length) out else java.util.Arrays.copyOf(out, n)
      m += 1
    }
    UTF8String.fromString(String.join(" ", syms: _*))
  }

  /** Column face: fuse `merges` (in order) into the space-joined symbol
    * string `sym`.
    */
  def bpeApply(sym: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.GraftBridge.column(
      BpeApply(org.apache.spark.sql.GraftBridge.expression(sym),
        merges.map(_._1), merges.map(_._2)))
}
