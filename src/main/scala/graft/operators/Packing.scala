package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: greedy next-fit binning of documents into
  * fixed-token-budget training sequences — the batching step every
  * LLM pre-training pipeline runs between corpus prep and the data
  * loader. Documents are never split (chunking to sub-document pieces
  * is [[Chunking]]'s job); a document larger than the budget occupies a
  * sequence alone.
  *
  * Semantics (deterministic, order-defined): per group (e.g. corpus
  * source), rows ordered by `idCol` ascending; a running sequence
  * accumulates token counts and a row that would push the open
  * sequence past `budget` closes it and starts the next (`seq_id` is
  * 0-based per group; zero-token rows join the open sequence). Like
  * the W7 min-spacing sweep, whether a row opens a new sequence
  * depends on the whole packed prefix — a genuine sequential fold, not
  * expressible as a window function.
  *
  * Scale shape: the same streaming-fold pattern as
  * [[Sessionize.minSpacingSweep]] — ONE hash exchange on the group
  * key, a spill-backed partition sort, then a single O(1)-state pass
  * that resets at group boundaries. No group is ever materialized, so
  * per-group volume is unbounded. Packing is inherently sequential
  * WITHIN a group (each seq_id depends on every earlier row), so
  * parallelism comes from the group count; a pipeline whose one group
  * dwarfs the rest should pre-shard it (e.g. a salt column folded into
  * the group key) and accept one under-filled sequence per shard —
  * boundary waste is bounded by `shards · budget` tokens.
  */
object Packing {

  /** Assign `seq_id` (0-based per group) by next-fit packing.
    * Output: (groupCol, idCol, tokCol, seq_id) under the input names;
    * group is compared as a string, id/tokens as longs.
    */
  def nextFitPack(df: DataFrame, groupCol: String, idCol: String,
                  tokCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string"), col(idCol).cast("long"),
        col(tokCol).cast("long"))
      .as[(String, Long, Long)]
      .repartition(col(groupCol))
      .sortWithinPartitions(col(groupCol), col(idCol))
      .mapPartitions { it =>
        var started = false
        var curKey: String = null
        var filled = 0L
        var seq = 0L
        it.map { case (g, id, tok) =>
          if (!started || g != curKey) {
            started = true; curKey = g; filled = 0L; seq = 0L
          }
          if (filled > 0 && filled + tok > budget) {
            seq += 1; filled = 0L
          }
          filled += tok
          (g, id, tok, seq)
        }
      }
      .toDF(groupCol, idCol, tokCol, "seq_id")
  }
}
