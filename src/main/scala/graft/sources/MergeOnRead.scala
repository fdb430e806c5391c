package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-READ row-level deletes — the Iceberg v2 equality-delete
  * shape (spec §delete-formats), and the complement of the engine's
  * copy-on-write face (s06 applyChangelog + rewrite): deletes land as
  * their own small tombstone rows (key, seq) and the base files are
  * NEVER rewritten; every read applies the tombstones. Copy-on-write
  * pays a rewrite per delete batch and reads stay pure scans;
  * merge-on-read pays nothing at delete time and a join at read time —
  * the right trade when deletes are sparse and frequent (GDPR erasure,
  * late-arriving retractions) against a 100 TB base.
  *
  * Sequence semantics (Iceberg's): a tombstone at seq s deletes every
  * base row of that key whose `seqCol` ≤ s; a row APPENDED after the
  * tombstone (base seq > s) survives — so delete-then-reinsert works
  * without touching the tombstone files.
  *
  * Scale shape: with base AND tombstones written KEY-BUCKETED at the
  * same width ([[Warehouse.writeBucketed]]), the read is exchange-ZERO —
  * the per-key tombstone max is an aggregate whose clustering the bucket
  * layout already satisfies, and the left join arrives co-partitioned
  * (MergeOnReadSpec pins 0 exchanges). Unbucketed inputs degrade to one
  * base exchange on the key — the classic merge-on-read "read tax" that
  * compaction (fold tombstones in, then vacuum them) eventually clears;
  * [[Compaction.compactSorted]] + [[Vacuum]] are that path here.
  */
object MergeOnRead {

  /** Stage a base table and its tombstone table, both key-bucketed at
    * the same width — the layout under which [[read]] plans no
    * exchange at all.
    */
  def stageBucketed(base: DataFrame, deletes: DataFrame, baseTable: String,
                    deleteTable: String, keyCol: String,
                    buckets: Int): Unit = {
    Warehouse.writeBucketed(base, baseTable, keyCol, buckets)
    Warehouse.writeBucketed(deletes, deleteTable, keyCol, buckets)
  }

  /** The merged view: base rows minus every row a tombstone covers.
    * Only the per-key MAX tombstone matters (a tombstone at seq s
    * covers everything a lower one covers), so the delete side
    * collapses to one row per deleted key before the join.
    */
  def read(spark: SparkSession, baseTable: String, deleteTable: String,
           keyCol: String, seqCol: String): DataFrame = {
    val base = spark.table(baseTable)
    val dels = spark.table(deleteTable)
      .groupBy(col(keyCol)).agg(max(col(seqCol)).as("__del_seq"))
    base.join(dels, Seq(keyCol), "left")
      .filter(col("__del_seq").isNull || col(seqCol) > col("__del_seq"))
      .drop("__del_seq")
  }
}
