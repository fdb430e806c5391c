package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column

/** IVF cell assignment (nearest codebook centroid by rounded cosine) as a
  * native Catalyst expression. Replaces the literal
  * `when(s === greatest(...), cid)` chain in
  * [[graft.operators.Similarity.ivfCell]], whose generated code grows
  * O(nlist²) source tokens (each of the nlist branches re-evaluates the
  * nlist-way `greatest`): past a few hundred centroids it trips Janino's
  * 64KB method limit into interpreted fallback on the hot path of every
  * IVF operator (v04/v06/v09/v10/v11, d13, v05). Here the codebook is an
  * `addReferenceObj` constant and the generated code is ONE method call
  * regardless of nlist — whole-stage codegen survives any production
  * codebook size (pinned at nlist=256 by IvfCellSpec).
  *
  * Semantics are EXACTLY the when-chain form's (kept as
  * `Similarity.ivfCellWhenChain`, the parity oracle — IvfCellSpec):
  *   - score = cosine(vec, centroid) with [[CosineSim.kernel]]'s
  *     sequential-fold FP order, rounded to 4 dp with Spark `round`
  *     semantics (BigDecimal HALF_UP on the shortest decimal repr,
  *     NaN/Inf passed through);
  *   - winner = the smallest centroid id achieving the maximum score,
  *     under Spark's double ordering (NaN greatest, NaN equals NaN) —
  *     ascending-cid scan with strict-greater improvement;
  *   - a null vector or a vector whose length differs from the codebook
  *     dimension yields -1, matching the when-chain (null cosines fail
  *     every `===` branch and fall through to the -1 default).
  */
case class IvfCell(child: Expression, cids: Seq[Int],
                   centroids: Seq[Seq[Double]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"ivf_cell expects array<double>, got ${dt.sql}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_cell"
  // total function: null/mismatched input maps to -1, like the when-chain
  override def nullable: Boolean = false

  @transient private lazy val table: IvfCell.Codebook =
    IvfCell.Codebook(cids.toArray, centroids.map(_.toArray).toArray)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) -1 else table.cell(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("ivfCodebook", table,
      "graft.plans.IvfCell.Codebook")
    ev.copy(code =
      code"""
        ${c.code}
        int ${ev.value} = ${c.isNull} ? -1 : $ref.cell(${c.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): IvfCell =
    copy(child = newChild)
}

object IvfCell {

  /** Precomputed codebook (ascending cid); `cell` is the per-row kernel. */
  final case class Codebook(cids: Array[Int], centroids: Array[Array[Double]]) {
    require(centroids.nonEmpty && cids.length == centroids.length)
    private val dim = centroids(0).length
    require(centroids.forall(_.length == dim))
    require(cids.toSeq == cids.toSeq.sorted,
      "codebook must be in ascending cid order (tiebreak = smallest cid)")

    def cell(v: ArrayData): Int = {
      if (v.numElements() != dim) return -1
      var bestC = -1
      var best = 0.0
      var c = 0
      while (c < centroids.length) {
        val ctr = centroids(c)
        // CosineSim.kernel's exact FP order (sequential fold, dot/(|a||b|))
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < dim) {
          val x = v.getDouble(i); val y = ctr(i)
          dot += x * y; na += x * x; nb += y * y
          i += 1
        }
        val s = round4(dot / (math.sqrt(na) * math.sqrt(nb)))
        // Double.compare = Spark's double ordering (NaN greatest, NaN==NaN);
        // strict > on an ascending-cid scan keeps the smallest id on ties
        if (bestC == -1 || java.lang.Double.compare(s, best) > 0) {
          best = s; bestC = cids(c)
        }
        c += 1
      }
      bestC
    }
  }

  /** `round(x, 4)` with Spark's Round semantics: BigDecimal HALF_UP on the
    * double's shortest decimal representation; NaN/Inf pass through
    * (BigDecimal.valueOf would throw).
    */
  def round4(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  def ivfCell(vec: Column, codebook: Seq[(Int, Array[Double])]): Column = {
    val sorted = codebook.sortBy(_._1)
    org.apache.spark.sql.GraftBridge.column(
      IvfCell(org.apache.spark.sql.GraftBridge.expression(vec),
        sorted.map(_._1), sorted.map(_._2.toSeq)))
  }
}
