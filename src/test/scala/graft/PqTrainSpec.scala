package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** PQ codebook training (Similarity.pqTrain) pinned against an
  * independent serial implementation (per-subspace Lloyd: assignment by
  * exact 1e-6-integer-quantized L2 with smallest-cid ties — the PqEncode
  * kernel's contract — 1e-6-quantized sub-codeword means, empty
  * (subspace, codeword) pairs keep their slice), plus the measured
  * quantization-error delta: total exact-integer reconstruction distance
  * with the TRAINED codebook vs the UNTRAINED init — the number that
  * justifies training at all (a recorded measurement, not a claim).
  */
class PqTrainSpec extends SparkTestBase {

  private val M = 4
  private val Dim = 64
  private val Sub = Dim / M

  private def embeddings = spark.read.parquet(s"$sfSmoke/embeddings.parquet")

  private def collected: Seq[(Long, Array[Double])] = embeddings
    .select(col("vec_id"), col("embedding"))
    .collect()
    .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    .toSeq

  private def init(vs: Seq[(Long, Array[Double])]): Seq[(Int, Array[Double])] =
    vs.filter(v => v._1 >= 1 && v._1 <= 8)
      .map { case (id, v) => id.toInt -> v }.sortBy(_._1)

  /** Spark `round(x*1e6)` semantics: HALF_UP on the shortest decimal
    * repr (the same quantizer KmeansTrainSpec pins).
    */
  private def q(x: Double): Long = new java.math.BigDecimal(
    java.lang.Double.toString(x * 1e6))
    .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** Exact-integer L2 of subvector j (1-based) of v against a
    * sub-codeword slice — PqEncode's distance.
    */
  private def subDist(v: Array[Double], j: Int, ce: Array[Double]): Long = {
    var s = 0L
    var i = 0
    while (i < Sub) {
      val d = q(v((j - 1) * Sub + i) - ce(i))
      s += d * d
      i += 1
    }
    s
  }

  /** Serial per-subspace Lloyd the distributed pqTrain must reproduce.
    * Codebook kept in pqCodes' full-dim layout throughout.
    */
  private def serialTrain(vs: Seq[(Long, Array[Double])],
                          init0: Seq[(Int, Array[Double])],
                          rounds: Int): Seq[(Int, Array[Double])] = {
    var cb = init0
    for (_ <- 1 to rounds) {
      val next = cb.map { case (cid, ctr) => cid -> ctr.clone() }
      for (j <- 1 to M) {
        val assigned = vs.groupBy { case (_, v) =>
          cb.sortBy(_._1).minBy { case (cid, ctr) =>
            (subDist(v, j, ctr.slice((j - 1) * Sub, j * Sub)), cid)
          }._1
        }
        for ((cid, ctr) <- next) {
          assigned.get(cid).foreach { members =>
            for (i <- 0 until Sub) {
              val qs = members.map(m => q(m._2((j - 1) * Sub + i))).sum
              ctr((j - 1) * Sub + i) = qs.toDouble / (members.size * 1e6)
            }
          }
        }
      }
      cb = next
    }
    cb
  }

  test("pqTrain == serial per-subspace Lloyd on sf0.001 embeddings, " +
    "3 rounds") {
    val vs = collected
    val got = Similarity.pqTrain(embeddings, "embedding", init(vs), M, 3)
    val want = serialTrain(vs, init(vs), 3)
    assert(got.map(_._1) == want.map(_._1))
    got.zip(want).foreach { case ((cid, g), (_, w)) =>
      assert(g.toSeq == w.toSeq, s"codeword $cid diverges")
    }
  }

  test("rounds = 0 returns the init codebook unchanged") {
    val vs = collected
    val cb = init(vs)
    assert(Similarity.pqTrain(embeddings, "embedding", cb, M, 0) == cb)
  }

  /** Total exact-integer quantization error of encoding every vector
    * with `cb` — Σ over vectors and subspaces of the L2 distance to the
    * assigned codeword.
    */
  private def totalError(vs: Seq[(Long, Array[Double])],
                         cb: Seq[(Int, Array[Double])]): Long =
    vs.map { case (_, v) =>
      (1 to M).map { j =>
        cb.map { case (cid, ctr) =>
          subDist(v, j, ctr.slice((j - 1) * Sub, j * Sub))
        }.min
      }.sum
    }.sum

  test("measured quantization error: trained codebook vs untrained init") {
    val vs = collected
    val untrained = totalError(vs, init(vs))
    val trained = totalError(vs,
      Similarity.pqTrain(embeddings, "embedding", init(vs), M, 3))
    info(s"total exact-integer PQ error over ${vs.size} vectors: " +
      s"untrained=$untrained trained=$trained " +
      f"(${100.0 * (untrained - trained) / untrained}%.1f%% lower)")
    // each Lloyd round weakly decreases within-cell SSE per subspace, so
    // the trained codebook must not quantize WORSE than its init
    assert(trained <= untrained,
      s"trained error $trained exceeds untrained $untrained")
  }
}
