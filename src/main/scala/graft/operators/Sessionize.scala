package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event sessionization + the order-sensitive keep/drop sweep.
  *
  * `sessionize` is a pure window computation (scales as a single shuffle on
  * the user key). `minSpacingSweep` is the Tegallega W7 min-spacing fold
  * (update-routes.js:353-373): whether a row survives depends on the last
  * KEPT row, not the previous row — not expressible as a window function,
  * so it is the one place we use the typed Dataset API
  * (groupByKey.flatMapGroups over an explicitly sorted group), exactly as
  * SURVEY.md §2.12 prescribes. Group size is bounded by per-key volume.
  */
object Sessionize {

  /** Assign 1-based session indexes per user: a new session starts when the
    * gap from the previous event exceeds `gapMs`.
    */
  def sessionize(events: DataFrame, userCol: String, tsMsCol: String,
                 idCol: String, gapMs: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsMsCol), col(idCol))
    events
      .withColumn("__gap", col(tsMsCol) - lag(col(tsMsCol), 1).over(w))
      .withColumn("__new", when(col("__gap").isNull || col("__gap") > gapMs, 1)
        .otherwise(0))
      .withColumn("session_index",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__gap", "__new")
  }

  /** W7 sweep: per key, ordered by (tsMs, id), keep a row iff it is ≥
    * `minGapMs` after the last kept row; the first row is always kept.
    * Output columns: (key, tsMs, id) under the original names.
    */
  def minSpacingSweep(df: DataFrame, keyCol: String, tsMsCol: String,
                      idCol: String, minGapMs: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Streaming fold, not flatMapGroups: hash-partition by key, sort each
    // partition by (key, ts, id), then a single pass that resets its
    // carried "last kept" state at key boundaries. Unlike
    // groupByKey.flatMapGroups (which buffers and sorts each group in
    // memory), this never materializes a group — a key with a billion
    // rows streams through spill-backed partition sort, so the operator
    // survives arbitrary per-key volume.
    df.select(col(keyCol).cast("long"), col(tsMsCol).cast("long"),
        col(idCol).cast("long"))
      .as[(Long, Long, Long)]
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(tsMsCol), col(idCol))
      .mapPartitions { it =>
        var curKey = 0L
        var last = 0L
        var started = false
        it.filter { case (k, ts, _) =>
          if (!started || k != curKey) {
            started = true; curKey = k; last = ts; true
          } else if (ts - last >= minGapMs) {
            last = ts; true
          } else false
        }
      }
      .toDF(keyCol, tsMsCol, idCol)
  }
}
