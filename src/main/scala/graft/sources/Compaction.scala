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

  /** Compact only the HOT partitions of a partition-column table
    * ([[Warehouse.writePartitioned]] layout) — the maintenance pass an
    * append-accreting table needs (an IVF index under
    * [[graft.operators.Similarity.appendIvfIndex]], a date-partitioned
    * log under daily appends): every partition directory holding more
    * than `maxFiles` data files is rewritten to ⌈rows/targetRows⌉
    * files; every other partition is left byte-identical. Returns the
    * compacted partition values (empty = nothing was hot).
    *
    * Scale shape: hot-partition discovery is a driver-side FILE-METADATA
    * listing (bounded by file count — the same class of listing any
    * lakehouse maintenance planner pays, and exactly what the s04/s11
    * planners already do); the rewrite reads ONLY the hot partitions
    * (`partCol IN (…)` is a static partition filter, planning-time
    * pruned) and replaces ONLY them (dynamic partition overwrite), so
    * the cost is O(hot data), never O(table). The hot rows are
    * materialized before the overwrite because Spark (rightly) refuses
    * to overwrite a path it is still reading from; `checkpointDir`
    * selects the reliable-checkpoint mode for cluster runs
    * ([[graft.operators.Iteration.materializer]] contract — the
    * executor-pinned localCheckpoint default is the single-node mode).
    *
    * Probe invariance is the contract: partition directory names,
    * pruning behavior, and content MULTISET are all unchanged — only
    * the file count inside hot directories drops (the v28 oracle
    * hash-checks the probe; CompactionSpec pins the file counts).
    */
  def compactHotPartitions(spark: org.apache.spark.sql.SparkSession,
                           table: String, partCol: String, targetRows: Long,
                           maxFiles: Int = 1,
                           checkpointDir: Option[String] = None)
      : Seq[String] = {
    require(targetRows >= 1, s"targetRows must be >= 1, got $targetRows")
    require(maxFiles >= 1, s"maxFiles must be >= 1, got $maxFiles")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hot = fs.listStatus(wh).toSeq
      .filter(d => d.isDirectory && d.getPath.getName.startsWith(partCol + "="))
      .flatMap { d =>
        val files = fs.listStatus(d.getPath).count(f =>
          f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
        if (files > maxFiles)
          Some(d.getPath.getName.stripPrefix(partCol + "="))
        else None
      }
    if (hot.isEmpty) return Nil
    val ckpt = graft.operators.Iteration.materializer(spark, checkpointDir)
    // partition values compare as strings (they ARE directory names)
    val hotRows = ckpt(spark.table(table)
      .filter(col(partCol).cast("string").isin(hot: _*)))
    val modeKey = "spark.sql.sources.partitionOverwriteMode"
    val fileKey = "spark.sql.files.maxRecordsPerFile"
    val prevMode = spark.conf.get(modeKey, "static")
    val prevFile = spark.conf.get(fileKey, "0")
    spark.conf.set(modeKey, "dynamic")
    spark.conf.set(fileKey, targetRows.toString)
    try {
      // one writing task per hot partition (oversize ones split by
      // maxRecordsPerFile); insertInto is positional, and
      // spark.table(table) yields the stored order by construction
      hotRows.repartition(col(partCol))
        .write.mode("overwrite").format("parquet").insertInto(table)
    } finally {
      spark.conf.set(modeKey, prevMode)
      spark.conf.set(fileKey, prevFile)
    }
    hot
  }
}
