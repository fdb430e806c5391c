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
}
