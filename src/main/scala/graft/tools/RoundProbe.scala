package graft.tools

import org.apache.spark.sql.functions._

/** Diagnostic: measure the round count (fixpoint depth) of the
  * transfer-aware RAPTOR loop on the fact-scale timetable — sizes the
  * unrolled stage count of the r23 oracle mirror honestly (run at each
  * SF; the mirror needs stages ≥ the deepest measured fixpoint).
  *
  * Usage: runMain graft.tools.RoundProbe [sfDir]
  */
object RoundProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.Graft.session()
    val st = graft.queries.GraphQ.factStopTimes(spark, sfDir)
    val xf = graft.queries.GraphQ.factTransfers(spark, sfDir)
    val prof = graft.graph.Routing.arrivalProfile(st, 0L, 0L,
      maxRounds = 100, transfers = Some(xf), broadcastTransfers = false)
    val mx = prof.agg(max(col("rounds"))).collect()(0).getInt(0)
    println(s"ROUNDPROBE max_rounds=$mx sf=$sfDir")
    spark.stop()
  }
}
