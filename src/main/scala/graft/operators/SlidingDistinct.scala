package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sliding-window DISTINCT counts — the trailing-7-day-active-users
  * (WAU) metric family. Spark (and ANSI SQL engines generally) reject
  * `COUNT(DISTINCT x) OVER (RANGE ...)`, and the naive rewrites are
  * disasters at scale: per-window `collect_set` materializes a user set
  * per (key, day), and a day×activity range self-join is O(days·users).
  *
  * The engine form is the interval-coverage decomposition:
  *  1. reduce the stream to DISTINCT (key, entity, day) — map-side
  *     combined, the only entity-scale pass;
  *  2. each activity day e makes its entity count toward windows ending
  *     in [e, e+w−1]. With p = the entity's PREVIOUS activity day, the
  *     not-already-covered span is [max(e, p+w), e+w−1] — non-empty
  *     whenever e > p, so each (entity, day) row emits exactly one
  *     +1/−1 delta pair and an entity is counted once per window it
  *     touches, however many times it was active (the per-entity lag
  *     runs in a (key, entity)-partitioned window);
  *  3. scatter deltas onto the day grid (per key, min..max activity
  *     day) and prefix-sum per key — day-scale rows from here on.
  *
  * No user set ever materializes; the heavy data is touched once; the
  * delta/prefix stages run at (keys × days) cardinality, independent of
  * entity volume. Exact integers end to end.
  */
object SlidingDistinct {

  /** Trailing distinct-entity counts per (key, day): for every day in
    * each key's [min, max] activity-day span, the number of distinct
    * entities active at least once in [day − windowDays + 1, day].
    * Output: (keyCol, day, n_distinct).
    */
  def slidingDistinct(events: DataFrame, keyCol: String, entityCol: String,
                      dayCol: String, windowDays: Int): DataFrame = {
    require(windowDays > 0, s"windowDays must be positive, got $windowDays")
    val w = windowDays.toLong
    val activity = events
      .select(col(keyCol), col(entityCol), col(dayCol).cast("long").as("__d"))
      .distinct()
    val perEntity = Window.partitionBy(col(keyCol), col(entityCol))
      .orderBy(col("__d"))
    val deltas = activity
      .withColumn("__p", lag(col("__d"), 1).over(perEntity))
      .withColumn("__s", when(col("__p").isNull, col("__d"))
        .otherwise(greatest(col("__d"), col("__p") + w)))
      .withColumn("__e", col("__d") + (w - 1))
      .filter(col("__s") <= col("__e"))
      .select(col(keyCol), explode(array(
        struct(col("__s").as("day"), lit(1L).as("dl")),
        struct((col("__e") + 1).as("day"), lit(-1L).as("dl")))).as("x"))
      .select(col(keyCol), col("x.day"), col("x.dl"))
      .groupBy(col(keyCol), col("day")).agg(sum(col("dl")).as("dl"))
    val grid = activity.groupBy(col(keyCol))
      .agg(min(col("__d")).as("__lo"), max(col("__d")).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"))).as("day"))
    val perKey = Window.partitionBy(col(keyCol)).orderBy(col("day"))
    grid.join(deltas, Seq(keyCol, "day"), "left")
      .withColumn("n_distinct",
        sum(coalesce(col("dl"), lit(0L))).over(perKey))
      .select(col(keyCol), col("day"), col("n_distinct"))
  }
}
