package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Inverted-index construction — the retrieval-side primitive of a
  * corpus pipeline (BM25-style candidate generation, doc-grounded eval,
  * RAG indexing): per term, the document frequency and a tf-capped
  * posting list serialized in doc-id order (the storage order posting
  * lists are intersected in).
  *
  * Cap semantics = static impact-ordered pruning: keep each term's top
  * `maxPostings` documents by (tf DESC, doc_id ASC) — a total order
  * (doc ids are unique within a term), so the cap is deterministic and
  * a SQL oracle reproduces it exactly.
  */
object Index {

  /** Scale shape: tf is one shuffle on (term, doc) with map-side
    * combine. The per-term top-k runs TWO window phases — first
    * partitioned by (term, salt(doc)), which bounds a stopword-grade
    * hot term at its per-salt share instead of streaming the whole
    * corpus through one task, then by term over the ≤ salts·k
    * survivors. The global top-k is always contained in the union of
    * the per-salt top-k's, so the two phases equal the single hot
    * window exactly (IndexSpec pins the equivalence). df rides the
    * partial-aggregating term count (hot keys combine map-side), and
    * the vocabulary-sized df frame joins back broadcast under AQE.
    * Output: (term, df, n_postings, postings "doc:tf,doc:tf,…").
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    maxPostings: Int, salts: Int = 16): DataFrame = {
    require(maxPostings >= 1, "maxPostings must be >= 1")
    require(salts >= 1, "salts must be >= 1")
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.text.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w1 = Window.partitionBy(col("term"), col("__salt"))
      .orderBy(col("tf").desc, col("doc_id"))
    val w2 = Window.partitionBy(col("term"))
      .orderBy(col("tf").desc, col("doc_id"))
    val topk = tf
      .withColumn("__salt", Skew.saltColumn(salts, col("doc_id")))
      .withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= maxPostings)
      .withColumn("__rn", row_number().over(w2))
      .filter(col("__rn") <= maxPostings)
      .drop("__salt", "__rn")
    topk.groupBy(col("term"))
      .agg(postingsString(col("doc_id"), col("tf")).as("postings"),
        count(lit(1)).as("n_postings"))
      .join(dfreq, Seq("term"))
      .select(col("term"), col("df"), col("n_postings"), col("postings"))
  }

  /** "doc:tf,doc:tf,…" in doc-id order — an engine-independent
    * serialization (array_sort on the struct orders by the leading
    * doc_id field; ids are unique within a term). The HOF transform is
    * interpreted, but runs over ≤ maxPostings elements per term.
    */
  private def postingsString(docId: Column, tf: Column): Column =
    array_join(
      transform(array_sort(collect_list(struct(docId, tf))),
        x => concat(x.getField("doc_id").cast("string"), lit(":"),
          x.getField("tf").cast("string"))),
      ",")
}
