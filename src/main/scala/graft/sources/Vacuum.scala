package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retention vacuum planning over a lakehouse file manifest — the
  * maintenance step that completes the storage story (s04/s09 compact,
  * s06 MERGE, s10 time travel): which data files can be physically
  * deleted once snapshots older than a retention cutoff expire, and how
  * much space that reclaims (the Iceberg `expire_snapshots` / Delta
  * `VACUUM` planning semantics; reference analog: the repo's git
  * history IS its snapshot retention — every generation kept forever,
  * which a 100 TB table cannot afford).
  *
  * Visibility model (Iceberg-style sequence ranges): manifest row
  * (file_id, part, bytes, added_seq, removed_seq) — snapshot s sees the
  * file iff added_seq ≤ s AND (removed_seq is NULL OR s < removed_seq).
  * Expiring every snapshot below `retainFrom` makes a file deletable
  * iff NO retained snapshot sees it: removed_seq ≤ retainFrom (removed
  * before the oldest retained snapshot; a NULL removed_seq is live in
  * the current snapshot and never deletable — even a file ADDED after
  * retainFrom but already removed again can go, its whole lifetime fell
  * inside the expired range).
  *
  * Scale shape: the manifest is file-count-scale (millions of rows for
  * a 100 TB table, not billions) and the plan is ONE scan with a
  * map-side-combined rollup per partition — no join, no data-file I/O.
  * Classification is a pure per-row predicate, so the planner
  * distributes trivially and composes with the s04 packer (vacuum
  * first, compact survivors).
  */
object Vacuum {

  /** Per-row classification: "deletable" | "live". */
  def fileState(removedSeq: Column, retainFrom: Long): Column =
    when(removedSeq.isNotNull && removedSeq <= retainFrom, "deletable")
      .otherwise("live")

  /** The vacuum plan rollup: per partition, files/bytes deletable under
    * `retainFrom` vs still live — the numbers an operator reviews
    * before running the physical delete.
    */
  def plan(manifest: DataFrame, partCol: String, bytesCol: String,
           removedSeqCol: String, retainFrom: Long): DataFrame = {
    val deletable = col(removedSeqCol).isNotNull &&
      col(removedSeqCol) <= retainFrom
    manifest.groupBy(col(partCol))
      .agg(sum(when(deletable, 1L).otherwise(0L)).as("n_deletable"),
        sum(when(deletable, col(bytesCol)).otherwise(0L))
          .as("reclaim_bytes"),
        sum(when(!deletable, 1L).otherwise(0L)).as("n_live"),
        sum(when(!deletable, col(bytesCol)).otherwise(0L))
          .as("live_bytes"))
  }
}
