package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.queries.VectorQ

/** The composed v09 path (ivfPqTopK: IVF probe → PQ-ADC shortlist →
  * exact re-rank) run with the TRAINED codebook (full-Lloyd
  * Similarity.kmeansTrain — the codebook v23 ships) vs the UNTRAINED
  * init, with recall@10 against exact brute force measured for both —
  * the end-to-end answer to "does training the codebook help the
  * actual ANN query path", recorded as numbers on every run.
  */
class IvfPqTrainedSpec extends SparkTestBase {

  private val M = 4
  private val K = 10

  private def embeddings = spark.read.parquet(s"$sfSmoke/embeddings.parquet")

  private def init: Seq[(Int, Array[Double])] = embeddings
    .filter(col("vec_id").between(1, VectorQ.CodebookSize))
    .select(col("vec_id"), col("embedding"))
    .collect()
    .map(r => r.getLong(0).toInt -> r.getSeq[Float](1).map(_.toDouble).toArray)
    .toSeq.sortBy(_._1)

  private def queryVec(qid: Long): Array[Double] = embeddings
    .filter(col("vec_id") === qid).select(col("embedding"))
    .head().getSeq[Float](0).map(_.toDouble).toArray

  /** Exact serial top-K by 4-dp-rounded cosine, smallest-id ties — the
    * independent ground truth (the bruteForceTopK contract, off-engine).
    */
  private def exactTopK(corpus: Seq[(Long, Array[Double])],
                        q: Array[Double]): Set[Long] = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r4(v: Double): Double = new java.math.BigDecimal(
      java.lang.Double.toString(v))
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    corpus.map { case (id, v) => (id, r4(cos(v, q))) }
      .sortBy { case (id, c) => (-c, id) }.take(K).map(_._1).toSet
  }

  /** recall@10 of the composed path under `cb` over the v17 panel. */
  private def recall(cb: Seq[(Int, Array[Double])]): Long = {
    val qids = VectorQ.RecallQueryIds
    val corpus = embeddings.filter(!col("vec_id").isin(qids: _*))
    val corpusLocal = corpus.select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toSeq
    qids.map { qid =>
      val q = queryVec(qid)
      val exact = exactTopK(corpusLocal, q)
      val approx = Similarity
        .ivfPqTopK(corpus, "vec_id", "embedding", cb, q,
          m = M, k = K, nprobe = 2, shortlist = 20)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      (exact intersect approx).size.toLong
    }.sum
  }

  test("measured recall@10 of the composed IVF-PQ path: trained vs " +
    "untrained codebook (nprobe = 2, shortlist = 20)") {
    val untrained = recall(init)
    val trained = recall(
      Similarity.kmeansTrain(embeddings, "embedding", init, 3))
    info(s"composed-path recall@10 hits over " +
      s"${VectorQ.RecallQueryIds.size} queries (of ${5 * K} possible): " +
      s"untrained=$untrained trained=$trained (delta=${trained - untrained})")
    assert(trained >= untrained,
      s"trained composed-path recall $trained fell below untrained " +
        s"$untrained")
  }
}
