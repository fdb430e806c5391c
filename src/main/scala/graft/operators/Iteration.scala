package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared guard for frontier loops (Routing.sssp/bfsHops,
  * Dedup.dupClusters): maxIter truncation with work left is otherwise
  * indistinguishable from convergence. Callers that bound hops BY DESIGN
  * (e.g. a query mirrored by a hop-bounded oracle) pass `enabled = false`
  * so the one log line that matters isn't trained away.
  */
private[graft] object Iteration {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Per-round materializer for iterative loop state.
    *
    * Default (`checkpointDir = None`): `localCheckpoint` — truncates
    * lineage with executor-local blocks, zero I/O. Correct and fast on a
    * single node, but the blocks are PINNED to the executors that hold
    * them, so on a real cluster one executor loss mid-iteration kills the
    * whole multi-round job.
    *
    * With `checkpointDir = Some(dir)`: reliable `Dataset.checkpoint` —
    * each round's state is written to `dir` (any Hadoop FS: HDFS/S3/…),
    * so executor loss only recomputes the current round's tasks. That is
    * the 100 TB deployment mode; the extra per-round write is the price
    * of fault tolerance. Checkpoint files accumulate per round unless
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (or the
    * caller deletes `dir` after the result is consumed — it is plain
    * data, not needed once the returned frame has been written out).
    */
  def materializer(spark: org.apache.spark.sql.SparkSession,
                   checkpointDir: Option[String]): DataFrame => DataFrame =
    checkpointDir match {
      case Some(dir) =>
        // setCheckpointDir appends a fresh UUID subdir per call; one per
        // loop invocation keeps concurrent loops from sharing rdd ids
        spark.sparkContext.setCheckpointDir(dir)
        df => df.checkpoint()
      case None => df => df.localCheckpoint()
    }

  /** The frontier is localCheckpoint'd at every call site, so the
    * emptiness probe is cheap.
    */
  def warnIfTruncated(what: String, frontier: DataFrame, rounds: Int,
                      maxIter: Int, enabled: Boolean = true): Unit =
    if (enabled && rounds >= maxIter && !frontier.isEmpty)
      log.warn(s"$what stopped at maxIter=$maxIter with a non-empty " +
        "frontier; results are partial — raise maxIter (or pass " +
        "warnOnTruncation=false if the hop bound is intentional)")
}
