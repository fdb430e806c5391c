package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: how far each entity progressed through a
  * stage sequence (view → click → purchase …) with FIRST-TOUCH
  * sequential matching — stage i counts as reached at the EARLIEST
  * event of its type strictly after the time stage i-1 was reached.
  * That is the standard product-analytics funnel semantics, and it is
  * order-defined the same way the W7 sweep is: whether an event
  * advances the funnel depends on the whole matched prefix, so it is a
  * sequential fold, not a window function.
  *
  * Equalities are strict: an event at EXACTLY the previous stage's
  * timestamp does not advance (simultaneous events cannot be ordered,
  * so they must not count as "after") — which also makes the fold's
  * result independent of how ties are ordered in the sort. Stages
  * after the first must land within `windowUs` of the previous
  * stage's time (the conversion window every funnel tool takes);
  * first-touch means no backtracking — if the first qualifying
  * stage-1 event leads nowhere, a later one is not retried, the
  * standard strict-first-touch semantics.
  *
  * Scale shape: events are first filtered to the funnel's stage types
  * (the only rows that can matter), then ONE hash exchange on the
  * entity key with a per-entity sorted-array fold (sort_array +
  * `aggregate` HOF, O(1) state) — the per-entity array holds only
  * funnel-relevant events, the same bound every funnel engine accepts;
  * an adversarially hot entity is capped upstream the same way a hot
  * LSH bucket is. The fold is engine-mirrorable: stage i's time is
  * `min(ts of stage-i events with ts > t_{i-1})`, which a SQL oracle
  * expresses as a chain of per-stage conditional-min CTEs.
  */
object Funnel {

  /** Per-entity reached stage: (entityCol, reached) where reached ∈
    * [0, stages.length] — 0 = never entered, i = completed stage i.
    * `tsCol` must be a numeric (e.g. epoch micros) column.
    */
  def funnelStages(events: DataFrame, entityCol: String, typeCol: String,
                   tsCol: String, stages: Seq[String],
                   windowUs: Long): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    require(stages.distinct.size == stages.size, "stages must be distinct")
    require(windowUs > 0 && windowUs < Long.MaxValue / 2,
      s"need a positive, non-overflowing conversion window, got $windowUs")
    val stageArr = array(stages.map(lit): _*)
    events
      .filter(col(typeCol).isin(stages: _*))
      .select(col(entityCol),
        struct(col(tsCol).cast("long").as("ts"), col(typeCol).as("tp"))
          .as("e"))
      .groupBy(col(entityCol))
      .agg(sort_array(collect_list(col("e"))).as("ev"))
      .select(col(entityCol),
        aggregate(col("ev"),
          struct(lit(0).as("r"), lit(Long.MinValue).as("t")),
          (acc, e) => {
            val advances = acc.getField("r") < lit(stages.length) &&
              e.getField("tp") ===
                element_at(stageArr, acc.getField("r") + 1) &&
              e.getField("ts") > acc.getField("t") &&
              (acc.getField("r") === 0 ||
                e.getField("ts") <= acc.getField("t") + lit(windowUs))
            when(advances, struct((acc.getField("r") + 1).as("r"),
              e.getField("ts").as("t"))).otherwise(acc)
          },
          acc => acc.getField("r")).as("reached"))
  }
}
