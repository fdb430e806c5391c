package graft

import org.apache.spark.sql.functions._
import graft.operators.BinaryQuant

/** BinaryQuant: expression/driver packing parity on real embeddings,
  * hamming ground truths, and the recall sanity of the 1-bit prune.
  */
class BinaryQuantSpec extends SparkTestBase {
  import spark.implicits._

  test("bqCode equals the driver-side packing on real embeddings; " +
    "hamming(x, x) = 0 and matches a serial popcount") {
    val e = Tables(spark, sfSmoke).embeddings.limit(50)
      .select(col("vec_id"), col("embedding"))
    val rows = e.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val want = rows.map { case (id, v) =>
      id -> BinaryQuant.bqCodeLocal(v).toSeq }.toMap
    val got = e.select(col("vec_id"),
        BinaryQuant.bqCode(col("embedding"), dims = 64).as("c"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got == want && got.nonEmpty)
    // words really are 32-bit (packing never touches the sign bit)
    assert(got.values.flatten.forall(w => w >= 0L && w < (1L << 32)))

    val q = rows.head._2
    val qc = BinaryQuant.bqCodeLocal(q)
    val ham = e.select(col("vec_id"),
        BinaryQuant.hamming(BinaryQuant.bqCode(col("embedding"), 64),
          lit(qc)).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(ham(rows.head._1) == 0L)
    val serial = rows.map { case (id, v) =>
      id -> BinaryQuant.bqCodeLocal(v).zip(qc)
        .map { case (a, b) => java.lang.Long.bitCount(a ^ b).toLong }.sum
    }.toMap
    assert(ham == serial)
  }

  test("bqCode rejects non-multiple-of-32 dims") {
    intercept[IllegalArgumentException] {
      BinaryQuant.bqCodeLocal(Array(1.0, -1.0))
    }
  }

  test("1-bit prune recall: the hamming top-64 contains the exact " +
    "cosine top-1 on the real corpus") {
    val e = Tables(spark, sfSmoke).embeddings
    val q = e.filter(col("vec_id") === 0).select(col("embedding"))
      .collect()(0).getSeq[Float](0).map(_.toDouble).toArray
    val corpus = e.filter(col("vec_id") =!= 0)
    val exactTop = corpus.withColumn("cos",
        graft.functions.vectors.cosine(
          graft.functions.vectors.asDouble(col("embedding")), lit(q)))
      .orderBy(col("cos").desc, col("vec_id"))
      .select("vec_id").as[Long].head()
    val cand = corpus.withColumn("ham", BinaryQuant.hamming(
        BinaryQuant.bqCode(col("embedding"), 64),
        lit(BinaryQuant.bqCodeLocal(q))))
      .orderBy(col("ham"), col("vec_id")).limit(64)
      .select("vec_id").as[Long].collect().toSet
    assert(cand.contains(exactTop),
      s"hamming top-64 missed the exact top-1 ($exactTop)")
  }
}
