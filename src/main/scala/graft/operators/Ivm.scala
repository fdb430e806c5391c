package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental view maintenance (IVM): keep a materialized per-group
  * aggregate current under a CDC changelog WITHOUT recomputing it from
  * the base table — the delta-processing algebra of every streaming
  * materialized view (Flink retract streams, Materialize, Delta Live
  * Tables). At 100 TB the base scan is the thing you cannot afford per
  * refresh: the increment is what moves, so refresh cost must be
  * O(changelog), not O(table).
  *
  * Algebra for a (COUNT, SUM) view: the changelog compacts to one
  * winner per key (max seq — intermediate versions cancel out and are
  * never looked at); each touched key contributes a RETRACTION of its
  * pre-changelog row (looked up in the base snapshot) and, for a final
  * `U`, an INSERTION of its new row. Deltas aggregate per group and
  * merge into the stored view with one outer join; groups whose count
  * reaches zero leave the view. COUNT and SUM are self-inverting under
  * retraction — MIN/MAX are not (a retracted minimum forces a re-scan
  * of its group), which is exactly why engines class aggregates by
  * invertibility; this operator implements the invertible class.
  *
  * Scale shape: one increment-sized window (compact), one
  * increment-vs-base key probe (broadcastable increment, or exchange-
  * free against a key-bucketed at-rest snapshot — sources/Warehouse),
  * one increment-sized group rollup, one view-sized outer join. The
  * base table is never scanned, only probed.
  */
object Ivm {

  /** Maintain a per-`groupCol` (COUNT(*), SUM(valueCol)) view.
    *
    * `baseView` is the stored aggregate of the snapshot —
    * (groupCol, nCol, sumCol) — and MUST be consistent with `snapshot`
    * (same rows aggregated; the pair is one atomic publication).
    * `changelog` rows carry (key, seq, op, groupCol, valueCol) where op
    * `U` upserts the payload and `D` deletes the key, highest seq wins
    * per key (same contract as [[SnapshotDiff.applyChangelog]]).
    * Returns the refreshed view, identical to re-aggregating
    * applyChangelog(snapshot, changelog).
    */
  def maintainSumCount(baseView: DataFrame, snapshot: DataFrame,
                       changelog: DataFrame, keyCol: String, seqCol: String,
                       opCol: String, groupCol: String, valueCol: String,
                       nCol: String = "n_rows",
                       sumCol: String = "total"): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(seqCol).desc, col(opCol))
    val latest = changelog
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(keyCol).as("__ck"), col(opCol).as("__op"),
        col(groupCol).as("__ng"), col(valueCol).as("__nv"))
    // retract what each touched key contributed before the changelog:
    // an increment-sized probe into the snapshot (inner join — keys the
    // changelog inserts fresh have nothing to retract)
    val retract = latest
      .join(snapshot, col("__ck") === col(keyCol), "inner")
      .select(col(groupCol).as("__g"), lit(-1L).as("__dn"),
        (-col(valueCol)).as("__dv"))
    val insert = latest.filter(col("__op") === "U")
      .select(col("__ng").as("__g"), lit(1L).as("__dn"),
        col("__nv").as("__dv"))
    val deltas = retract.unionByName(insert)
      .groupBy(col("__g"))
      .agg(sum(col("__dn")).as("__dn"), sum(col("__dv")).as("__dv"))
    baseView
      .join(deltas, col(groupCol) === col("__g"), "full_outer")
      .select(coalesce(col(groupCol), col("__g")).as(groupCol),
        (coalesce(col(nCol), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as(nCol),
        (coalesce(col(sumCol), lit(0L)) + coalesce(col("__dv"), lit(0L)))
          .as(sumCol))
      .filter(col(nCol) > 0)
  }
}
