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
