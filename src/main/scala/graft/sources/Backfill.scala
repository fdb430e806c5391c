package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** PARTITION BACKFILL — idempotent re-computation of a slice of a
  * partitioned derived table (the daily-life lakehouse maintenance op:
  * a late-arriving correction, a bug fix replayed over one month, a
  * reprocessed source drop). Spark's dynamic partition overwrite is the
  * engine primitive: `INSERT OVERWRITE` replaces ONLY the partitions
  * the incoming frame actually contains rows for — untouched partition
  * directories stay byte-identical (BackfillSpec pins it), so the cost
  * is O(backfilled slice), never O(table), and re-running the same
  * backfill converges to the same bytes (idempotence by construction:
  * overwrite, not append).
  */
object Backfill {

  /** Overwrite exactly the partitions present in `df` inside the
    * partitioned managed table `table` (positional-safe: reordered
    * against the stored schema, the appendPartitioned hardening). The
    * session's partitionOverwriteMode is set to `dynamic` for the write
    * and restored after — STATIC mode (the default) would truncate the
    * whole table, which is the footgun this helper exists to fence off.
    */
  def overwritePartitions(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try {
      val stored = spark.table(table).columns
      df.select(stored.map(col): _*)
        .write.mode("overwrite").format("parquet").insertInto(table)
      // same relation-cache coherence note as Warehouse.appendPartitioned
      spark.catalog.refreshTable(table)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
