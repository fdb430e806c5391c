package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity
import SqlMacros._

/** Similarity search over the embeddings table: exact brute-force cosine
  * top-k (baseline) and the sign-bit-bucketed ANN probe (scale path — with
  * data bucketed by the sign signature, a probe scans one bucket instead of
  * the full table).
  */
object VectorQ extends QueryPack {

  /** Components used for the deterministic sign-bit bucket. */
  val BucketPositions: Seq[Int] = Seq(1, 17, 33, 49)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v01_knn_bruteforce" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
      Similarity.bruteForceTopK(
          e.filter(col("vec_id") =!= 0),
          e.filter(col("vec_id") === 0),
          "vec_id", "embedding", 10)
        .select(col("vec_id"), col("label"), col("cos4"))
        .orderBy(col("cos4").desc, col("vec_id"))
    },

    "v02_ann_bucket_probe" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val q = e.filter(col("vec_id") === 0)
      val eb = e.filter(col("vec_id") =!= 0)
        .withColumn("bucket", Similarity.signBucket(col("embedding"), BucketPositions))
      val qb = broadcast(q.select(col("embedding").as("__qvec"),
        Similarity.signBucket(col("embedding"), BucketPositions).as("qbucket")))
      import graft.functions.vectors
      eb.crossJoin(qb)
        .filter(col("bucket") === col("qbucket"))
        .withColumn("cos4", round(vectors.cosine(
          vectors.asDouble(col("embedding")), vectors.asDouble(col("__qvec"))), 4))
        .select(col("vec_id"), col("bucket"), col("cos4"))
        .orderBy(col("cos4").desc, col("vec_id"))
        .limit(5)
    },

    "v03_bucket_histogram" -> { (s, dir) =>
      Tables(s, dir).embeddings
        .withColumn("bucket", Similarity.signBucket(col("embedding"), BucketPositions))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    }
  )

  /** SQL mirror of Similarity.signBucket over BucketPositions. */
  private val bucketSql: String =
    BucketPositions.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN embedding[$p] > 0 THEN ${1 << (BucketPositions.size - 1 - i)} ELSE 0 END)"
    }.mkString(" + ")

  def oracle: Map[String, String] = Map(
    "v01_knn_bruteforce" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, label,
         | round(${cosineSql("embedding::DOUBLE[]", "qe::DOUBLE[]")}, 4) AS cos4
         |FROM embeddings, q WHERE vec_id <> 0
         |ORDER BY cos4 DESC, vec_id LIMIT 10""".stripMargin,

    "v02_ann_bucket_probe" ->
      s"""WITH q AS (
         | SELECT embedding AS qe, $bucketSql AS qbucket
         | FROM embeddings WHERE vec_id = 0),
         |b AS (
         | SELECT vec_id, embedding, $bucketSql AS bucket
         | FROM embeddings WHERE vec_id <> 0)
         |SELECT vec_id, bucket,
         | round(${cosineSql("embedding::DOUBLE[]", "qe::DOUBLE[]")}, 4) AS cos4
         |FROM b, q WHERE bucket = qbucket
         |ORDER BY cos4 DESC, vec_id LIMIT 5""".stripMargin,

    "v03_bucket_histogram" ->
      s"""SELECT $bucketSql AS bucket, count(*) AS n
         |FROM embeddings GROUP BY 1 ORDER BY bucket""".stripMargin
  )
}
