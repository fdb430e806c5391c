package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SHALLOW (zero-copy) table clones — the Delta/Iceberg CLONE face: a
  * clone is a MANIFEST of the source's data files at clone time plus its
  * own delta table, so creating one costs O(files) metadata and zero
  * data movement no matter how many terabytes the source holds. The two
  * tables then evolve independently: appends to the clone land in its
  * delta, appends to the source land in new source files the manifest
  * never lists — snapshot isolation by construction (the file list IS
  * the snapshot, the s10/s11 manifest doctrine).
  *
  * The standard shallow-clone caveat applies and is the caller's
  * retention contract, as in every lakehouse: physically deleting a
  * source file that a clone's manifest still references (vacuum,
  * compaction rewrite) breaks that clone — [[Vacuum.plan]]'s
  * retention cutoff is the tool for sequencing those.
  */
object Clone {

  private def manifestT(clone: String) = clone + "__manifest"
  private def deltaT(clone: String) = clone + "__delta"

  /** Snapshot `baseTable` as shallow clone `cloneName`: write the
    * manifest (the base's CURRENT file list — O(files), no data read)
    * and an empty delta holding the base schema. The base's root
    * location rides along in the manifest so [[readClone]] can recover
    * PARTITION-column values from directory names (they live in the
    * path, not in the files — reading the files without a basePath
    * would silently return NULL for every partition column).
    */
  def shallowClone(spark: SparkSession, baseTable: String,
                   cloneName: String): Unit = {
    val files = spark.table(baseTable).inputFiles.toSeq
    require(files.nonEmpty, s"clone of empty/fileless table $baseTable")
    val basePath = spark.sessionState.catalog
      .getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(baseTable))
      .location.toString
    import spark.implicits._
    Warehouse.writeTable(
      files.map((_, basePath)).toDF("path", "base_path"),
      manifestT(cloneName))
    Warehouse.writeTable(
      spark.table(baseTable).filter(lit(false)), deltaT(cloneName))
  }

  /** Append rows to the CLONE only — the base is never touched. */
  def appendToClone(df: DataFrame, cloneName: String): Unit =
    Warehouse.appendPartitioned(df, deltaT(cloneName))

  /** Read the clone: the manifested snapshot files plus the clone's own
    * delta. The manifest collect is bounded by FILE COUNT (metadata, not
    * data — the s04/s11 manifest economics); the snapshot scan reads the
    * listed files directly, so source appends after the clone are
    * invisible here and clone appends are invisible to the source.
    */
  def readClone(spark: SparkSession, cloneName: String): DataFrame = {
    val mt = spark.table(manifestT(cloneName))
    val delta = spark.table(deltaT(cloneName))
    // basePath anchors partition discovery at the base table's root, so
    // a PARTITIONED base's partition-column values are recovered from
    // the directory names of the manifested files (harmless no-op for
    // an unpartitioned base). Manifests written before base_path existed
    // lack the column — fall back to the bare-path read (their bases
    // were unpartitioned by the old code's limits).
    val reader =
      if (mt.columns.contains("base_path"))
        spark.read.option("basePath",
          mt.select(col("base_path")).head().getString(0))
      else spark.read
    val paths = mt.select(col("path")).collect().map(_.getString(0))
    reader.schema(delta.schema).parquet(paths: _*)
      .unionByName(delta)
  }
}
