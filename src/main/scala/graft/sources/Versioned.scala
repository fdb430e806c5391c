package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned tables with snapshot history and ZERO-COPY ROLLBACK — the
  * Iceberg `rollback_to_snapshot` face, the one lifecycle verb the
  * maintenance family (compaction s04/s09, time travel s10, vacuum s11,
  * clone s17, backfill s18) still lacked: undo a bad commit WITHOUT
  * rewriting data and WITHOUT erasing history.
  *
  * Model (the s10/s11 manifest doctrine made physical): every commit
  * appends new parquet files to the data table and records snapshot
  * version k as the FULL list of files visible at k (an O(files)
  * metadata row-set per version — what Iceberg's per-snapshot manifest
  * lists hold). Reads never list directories; they read a version's
  * manifested files exactly (so concurrent appends are invisible —
  * snapshot isolation by construction, the Clone doctrine).
  *
  * ROLLBACK to v commits a NEW version whose file list is v's: zero
  * data movement (VersionedSpec pins the data directory byte-set
  * unchanged), history intact (every earlier version — including the
  * rolled-back-over ones — stays readable), and the table's history
  * stays append-only, which is what makes the operation safe under
  * readers (a reader pinned at any version never sees files vanish;
  * physical deletion is [[Vacuum]]'s separately-sequenced job).
  *
  * Scale shape: commits touch O(new files) + one manifest append;
  * rollback is O(files-at-v) metadata; reads scan exactly one
  * version's files with partition pruning intact (basePath anchors
  * directory-derived partition values — the Clone round-13 lesson).
  */
object Versioned {

  private def snapT(t: String) = t + "__snapshots"
  private def dataT(t: String) = t + "__data"

  /** Create the table at version 1 with `df`'s rows. This Spark writes
    * one (empty) part file even for an empty frame, so an empty create
    * yields a usable empty v1 (VersionedSpec pins it); the require is
    * the fallback for writers that emit ZERO files, where v1 would
    * otherwise be an empty manifest that poisons every later call.
    */
  def create(spark: SparkSession, df: DataFrame, table: String): Unit = {
    Warehouse.writeTable(df, dataT(table))
    val files = spark.table(dataT(table)).inputFiles.toSeq
    require(files.nonEmpty,
      s"Versioned.create of empty/fileless $table — seed with >= 1 row")
    import spark.implicits._
    Warehouse.writeTable(
      files.map((1L, _)).toDF("version", "path"),
      snapT(table))
  }

  /** Append `df` as a new commit; returns the new version. The new
    * snapshot's file list = previous version's files + the files this
    * append created (the before/after inputFiles diff — commit-local
    * attribution without a transaction log, which makes this a
    * SINGLE-WRITER table: a concurrent committer's files would be
    * mis-attributed, the same contract every manifest writer in this
    * repo states — real lakehouses put an atomic pointer swap here).
    *
    * `expectedVersion` is the optimistic-concurrency guard: pass the
    * version you read before preparing the append and an interleaved
    * commit fails LOUDLY here instead of silently folding a concurrent
    * writer's files into this snapshot (the closest single-writer
    * analogue of the lakehouse pointer-swap CAS).
    */
  def commitAppend(spark: SparkSession, df: DataFrame,
                   table: String,
                   expectedVersion: Option[Long] = None): Long = {
    expectedVersion.foreach { exp =>
      val cur = currentVersion(spark, table)
      require(cur == exp,
        s"concurrent commit detected on $table: expected version $exp, " +
          s"found $cur — re-read and retry")
    }
    val before = spark.table(dataT(table)).inputFiles.toSet
    Warehouse.appendPartitioned(df, dataT(table))
    val added = spark.table(dataT(table)).inputFiles.toSet -- before
    val v = currentVersion(spark, table)
    import spark.implicits._
    val prev = spark.table(snapT(table))
      .filter(col("version") === v).select(col("path"))
    Warehouse.appendPartitioned(
      prev.unionByName(added.toSeq.toDF("path"))
        .select(lit(v + 1).as("version"), col("path")),
      snapT(table))
    v + 1
  }

  /** ROLLBACK: commit a new version whose file list is version `v`'s —
    * zero-copy, history-preserving. Returns the new version.
    */
  def rollbackTo(spark: SparkSession, table: String, v: Long): Long = {
    val cur = currentVersion(spark, table)
    require(v >= 1 && v <= cur, s"rollback target $v outside [1, $cur]")
    val target = spark.table(snapT(table))
      .filter(col("version") === v).select(col("path"))
    Warehouse.appendPartitioned(
      target.select(lit(cur + 1).as("version"), col("path")),
      snapT(table))
    cur + 1
  }

  def currentVersion(spark: SparkSession, table: String): Long =
    spark.table(snapT(table)).agg(max(col("version"))).head().getLong(0)

  /** Read version `v` exactly: its manifested files, nothing else. */
  def readVersion(spark: SparkSession, table: String, v: Long): DataFrame = {
    val paths = spark.table(snapT(table))
      .filter(col("version") === v)
      .select(col("path")).collect().map(_.getString(0))
    require(paths.nonEmpty, s"no snapshot $v for $table")
    val basePath = spark.sessionState.catalog
      .getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(dataT(table)))
      .location.toString
    spark.read.option("basePath", basePath)
      .schema(spark.table(dataT(table)).schema)
      .parquet(paths: _*)
  }

  /** Read the CURRENT version (post-rollback: the rolled-back state). */
  def readCurrent(spark: SparkSession, table: String): DataFrame =
    readVersion(spark, table, currentVersion(spark, table))
}
