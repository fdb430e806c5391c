package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Zone maps (min/max file statistics) — the data-skipping index every
  * lakehouse format keeps per file (Parquet row-group stats, Iceberg
  * manifest ranges, Delta file stats), expressed with the suite's
  * write-once/probe-a-sliver machinery. Distinct from [[ZOrder]]: z-order
  * RE-CLUSTERS data so a 2-D box prunes; a zone map prunes on whatever
  * clustering the data ALREADY has — including on columns that are
  * merely CORRELATED with the layout key (data written by ingest month
  * prunes on commit/receipt dates too, because time-adjacent rows land
  * in the same files). No re-layout, no bit tricks: just per-file min/max
  * of the probe column, consulted before any task runs.
  *
  * The stats table is file-count scale (bounded by the table's file
  * count — ~10⁵ entries at 100 TB), so the probe resolves it on the
  * DRIVER — codebook-class work, the [[ZOrder.bucketsForBox]] doctrine —
  * and the surviving file keys land in the plan as `key IN (…)`
  * literals: static partition pruning at PLANNING time. Files whose
  * [min,max] misses the range are never opened; the exact predicate
  * still runs over what is read, so a stale or over-wide zone map can
  * only cost I/O, never correctness.
  */
object ZoneMap {

  /** Stats-table name for `table`. */
  def statsTable(table: String): String = table + "_zonemap"

  /** Write `df` partitioned by `fileKeyCol` (the "file" granularity —
    * an ingest batch, a date bucket) plus a zone-map stats table
    * holding per-file min/max of `statCol`. One map-side-combined
    * aggregate over the data builds the stats — the same single pass
    * the writer already makes.
    */
  def writeWithStats(df: DataFrame, table: String, fileKeyCol: String,
                     statCol: String): Unit = {
    Warehouse.writePartitioned(df, table, Seq(fileKeyCol))
    Warehouse.writeTable(
      df.groupBy(col(fileKeyCol))
        .agg(min(col(statCol)).as("lo"), max(col(statCol)).as("hi")),
      statsTable(table))
  }

  /** Range probe `lo ≤ statCol ≤ hi` over a [[writeWithStats]] table:
    * consult the zone map for the file keys whose [min,max] intersects
    * the range (driver-side, file-count scale), prune to those
    * partitions at planning time, then apply the exact predicate.
    */
  def readRange(spark: SparkSession, table: String, fileKeyCol: String,
                statCol: String, lo: Long, hi: Long): DataFrame = {
    val keep = Warehouse.read(spark, statsTable(table))
      .filter(col("hi") >= lo && col("lo") <= hi)
      .select(col(fileKeyCol)).collect().map(_.get(0)).toSeq
    Warehouse.read(spark, table)
      .filter(col(fileKeyCol).isin(keep: _*))
      .filter(col(statCol).between(lo, hi))
  }
}
