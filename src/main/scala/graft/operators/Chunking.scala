package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.text

/** Context-window chunking — the "split every document into model-sized
  * token windows" prep step of a training pipeline.
  *
  * Pure per-row expressions (sequence → explode → slice → concat_ws, all
  * codegen'd, no HOFs): no shuffle, no window function — chunks distribute
  * with their document, so the operator scales with partition count and
  * composes with any upstream filter without re-clustering.
  */
object Chunking {

  /** Split each doc's normalized tokens into windows of `chunkSize`
    * tokens starting every `chunkSize - overlap` tokens (the standard
    * overlapping-window scheme). The final window may be shorter; a
    * window is emitted only if it contributes at least one token beyond
    * the previous window's coverage (start == 0 or start + overlap < n),
    * so no chunk is a suffix-duplicate of its predecessor. Docs with no
    * tokens produce no chunks.
    *
    * Output: (idCol, chunk_idx, n_tokens, chunk_text), chunk_idx 0-based
    * in document order.
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize=$chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap=$overlap must be in [0, chunkSize)")
    val stride = chunkSize - overlap
    val toks = text.tokens(col(textCol))
    // token count 0 for blank text (split("", " ") is [""], not []); null
    // text propagates null and the nt > 0 filter drops it
    val nt = when(text.normText(col(textCol)) === "", lit(0))
      .otherwise(size(toks))
    docs
      .select(col(idCol), toks.as("__toks"), nt.as("__nt"))
      .filter(col("__nt") > 0)
      .select(col(idCol), col("__toks"), col("__nt"),
        explode(sequence(lit(0), col("__nt") - 1, lit(stride))).as("__start"))
      .filter(col("__start") === 0 || col("__start") + overlap < col("__nt"))
      .select(col(idCol),
        (col("__start") / lit(stride)).cast("int").as("chunk_idx"),
        least(lit(chunkSize), col("__nt") - col("__start")).cast("bigint")
          .as("n_tokens"),
        concat_ws(" ", slice(col("__toks"), col("__start") + 1, lit(chunkSize)))
          .as("chunk_text"))
  }

  /** Content-defined chunking (CDC) at token granularity — the
    * rolling-boundary scheme storage dedup (LBFS/restic/borgbackup) uses,
    * applied to text: cut AFTER every token whose stable 16-bit hash ≡ 0
    * (mod `divisor`), so boundaries are a function of CONTENT, not
    * position. That is the property fixed-size chunking lacks: insert a
    * sentence into a document and every downstream fixed window shifts
    * (all chunk hashes change), while CDC boundaries re-align at the
    * next content cut — only the chunks touching the edit change, and
    * identical passages shared across documents produce identical chunk
    * hashes wherever they sit. Mean chunk length = `divisor` tokens.
    *
    * Scale shape: one shuffle on the doc id (posexplode + per-doc
    * prefix-count window + regroup — chunk assembly never leaves the
    * doc's partition); chunk hashes are 8-byte values, so the cross-doc
    * sharing join downstream is ids-only. The md5-derived token hash is
    * engine-independent ([[graft.functions.text.tokenHash16]]), so an
    * external system computes the same boundaries.
    *
    * Output: (idCol, chunk_id, n_tokens, chunk_hash) — chunk_id 0-based
    * in document order, chunk_hash = saltedHash32 of the
    * space-joined chunk text. Docs with no tokens produce no rows.
    */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
                divisor: Int): DataFrame = {
    require(divisor > 1, s"divisor=$divisor must be > 1")
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col(idCol), posexplode(text.tokens(col(textCol))))
      .toDF(idCol, "pos", "term")
      .filter(col("term") =!= "")
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    toks
      .withColumn("__cut",
        (text.tokenHash16(col("term")) % divisor === 0).cast("int"))
      // a cut token TERMINATES its chunk: id = #cuts strictly before it
      .withColumn("chunk_id", coalesce(
        sum(col("__cut")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0)).cast("int"))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(count(lit(1)).as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("term")))),
          x => x("term")), " ").as("__ctext"))
      .withColumn("chunk_hash", text.saltedHash32(col("__ctext"), 0))
      .drop("__ctext")
  }
}
