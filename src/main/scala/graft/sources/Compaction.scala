package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Compaction EXECUTION — the maintenance rewrite the s04 planner's bin
  * manifest exists for (every lakehouse's OPTIMIZE/rewrite-data-files
  * pass): take a table that has accreted small / unclustered files and
  * rewrite it so each data file is
  *
  *   - key-range CONTIGUOUS on `sortCol` (`repartitionByRange`: equal
  *     keys land in one partition, ranges never interleave),
  *   - SORTED within the file (`sortWithinPartitions` — row-group stats
  *     become tight, so zone-map/rowgroup pruning works after the
  *     rewrite; this is the property [[ZoneMap]] consumes), and
  *   - row-bounded (`maxRecordsPerFile` splits an oversize range
  *     partition into several files; the split point can duplicate a
  *     boundary KEY across two adjacent files, so adjacent files may
  *     touch at equal keys but never overlap beyond them).
  *
  * Scale shape: ONE count job + one range exchange of the table (the
  * rewrite everyone pays to compact) + a per-partition sort; no
  * driver-side data. File count = ⌈rows / targetRows⌉ tasks each
  * writing ~targetRows — at 100 TB the file count is what the range
  * partitioning spreads, not a driver bottleneck. Content is preserved
  * as a MULTISET exactly (a pure repartition+sort rewrite);
  * CompactionSpec asserts the file-level layout contracts and the s09
  * oracle proves content equality against the raw table.
  */
object Compaction {

  /** Rewrite `df` as managed parquet table `table`, compacted on
    * `sortCol` with ~`targetRows` rows per file. Same stale-location
    * cleanup as [[Warehouse.writeTable]].
    */
  def compactSorted(df: DataFrame, table: String, sortCol: String,
                    targetRows: Long): Unit = {
    require(targetRows >= 1, s"targetRows must be >= 1, got $targetRows")
    val spark = df.sparkSession
    val rows = df.count()
    // clamped: repartitionByRange takes an Int, and a pathological
    // rows/targetRows ratio (tiny target on a huge table) must not
    // overflow into a negative partition count
    val n = math.min(Int.MaxValue.toLong,
      math.max(1L, (rows + targetRows - 1) / targetRows)).toInt
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(wh)) fs.delete(wh, true)
    df.repartitionByRange(n, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite").format("parquet")
      .option("maxRecordsPerFile", targetRows)
      .saveAsTable(table)
  }
}
