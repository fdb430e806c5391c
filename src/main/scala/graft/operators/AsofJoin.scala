package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: attach to every left row the LATEST right row of the same
  * key with right.time <= left.time (inclusive) — the event-time lookup a
  * training-data pipeline needs for "state as of this event" joins
  * (feature snapshots, rate tables, config epochs).
  *
  * Spark has no native as-of join; the scalable shape is the union +
  * carry-forward window: tag right rows 0 and left rows 1, union them,
  * and per key carry the last non-null right payload forward in
  * (time, tag) order. One shuffle on the key, no per-key loops, no
  * range-condition explosion (a naive `l.t >= r.t` range join is a
  * per-key cross product that Spark plans as a nested loop). DuckDB's
  * native ASOF JOIN is the oracle for the query-pack entry.
  */
object AsofJoin {

  /** Left/right must share exactly `keyCol` and `timeCol` names; every
    * other column rides along (right's are prefixed `asof_` in the
    * output and are null when no right row precedes the left row).
    * Ties INSIDE right (same key + time) are not ordered — dedupe the
    * right side to one row per (key, time) first; at equal left/right
    * times the right row wins (inclusive semantics, like DuckDB ASOF).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               timeCol: String): DataFrame = {
    val lpayCols = left.columns.filterNot(c => c == keyCol || c == timeCol).toSeq
    val rpayCols = right.columns.filterNot(c => c == keyCol || c == timeCol).toSeq
    require(rpayCols.nonEmpty, "right side needs at least one payload column")
    val lpayT = left.select(struct(lpayCols.map(col): _*)).schema.head.dataType
    val rpayT = right.select(struct(rpayCols.map(col): _*)).schema.head.dataType
    val l = left.select(col(keyCol), col(timeCol), lit(1).as("__tag"),
      struct(lpayCols.map(col): _*).as("__lpay"),
      lit(null).cast(rpayT).as("__rpay"))
    val r = right.select(col(keyCol), col(timeCol), lit(0).as("__tag"),
      lit(null).cast(lpayT).as("__lpay"),
      struct(rpayCols.map(col): _*).as("__rpay"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(Seq(col(keyCol), col(timeCol)) ++
        lpayCols.map(c => col(s"__lpay.$c").as(c)) ++
        rpayCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
