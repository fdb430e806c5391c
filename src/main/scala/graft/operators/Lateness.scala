package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Watermark lateness audit: compute, for every event, the event-time
  * HIGH-WATER MARK that a streaming engine would hold when the event
  * arrives — max event time over everything that arrived strictly
  * before it. An event is dropped by a watermark of delay D exactly
  * when its event time < high_water − D, so the high-water column turns
  * "which delay should this pipeline use?" into a plain aggregate over
  * candidate delays — the batch-side measurement of the late-data
  * contracts the streaming faces (graft.streaming) document.
  *
  * The naive form — one window ordered by arrival over everything — is
  * a single-task global sort. This is the q16 two-phase prefix shape
  * instead (Relational.q16's distributed prefix sum, applied to max):
  * range-exchange on (arrival, id) so partitions are globally ordered
  * by arrival, per-partition exclusive running max, then a
  * partition-count-sized offsets frame (one row per partition) whose
  * own prefix max broadcasts back. Cost: ONE data-sized exchange; the
  * only serial path is over #partitions, not rows.
  */
object Lateness {

  /** Append `high_water`: the exclusive running max of `tsCol` in
    * (`arrivalCol`, `idCol`) order — null for the first-arriving event.
    * `idCol` must be unique (the deterministic tiebreak for equal
    * arrivals).
    */
  def withHighWater(events: DataFrame, tsCol: String, arrivalCol: String,
                    idCol: String): DataFrame = {
    // localCheckpoint pins the sampled range boundaries: the frame feeds
    // both the offsets branch and the main pass, and self-join branches
    // re-plan the exchange (attribute ids differ), so without
    // materializing, the branches could disagree on pid (the q16 note)
    val base = events
      .repartitionByRange(col(arrivalCol), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val wLocal = Window.partitionBy(col("__pid"))
      .orderBy(col(arrivalCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // one row per partition; the window over it is bounded by the
    // shuffle-partition count, independent of data volume
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("__pid"))
      .agg(max(col(tsCol)).as("__pmax"))
      .withColumn("__off", max(col("__pmax")).over(wOff))
      .select(col("__pid"), col("__off"))
    base
      .withColumn("__hw_local", max(col(tsCol)).over(wLocal))
      .join(broadcast(offsets), Seq("__pid"), "left")
      // greatest() ignores nulls: null iff no event arrived earlier
      .withColumn("high_water", greatest(col("__hw_local"), col("__off")))
      .drop("__pid", "__hw_local", "__off")
  }
}
