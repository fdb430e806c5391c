package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file membership bitmaps — the POINT-LOOKUP complement of
  * [[ZoneMap]]'s min/max ranges (Parquet bloom filters, Iceberg
  * manifest blooms, the "big metadata" of every lakehouse format): a
  * zone map prunes range predicates on clustered-or-correlated columns,
  * but a point lookup on a HIGH-CARDINALITY, layout-independent key
  * (order id, doc id, user id) intersects every file's [min,max] and
  * zone maps prune nothing. The bitmap does: each file keeps a 2¹⁶-bit
  * membership bitmap of its keys' hash buckets (a k=1 Bloom filter —
  * false-positive rate = distinct-buckets/2¹⁶, no false negatives), and
  * a lookup opens only the files whose bitmap contains the probe key's
  * bucket.
  *
  * Storage shape: (fileKey, word, bits) rows — ≤1024 longs per file
  * (8 KB of sketch per file, the realistic bloom budget), written as a
  * plain table. A probe touches ONE word index, so the driver-side
  * consult reads ≤ one row per file after pushdown — file-count scale,
  * the [[ZOrder.bucketsForBox]] doctrine — and the surviving file keys
  * land in the plan as `IN (…)` literals: static partition pruning at
  * PLANNING time. The exact predicate still runs over what is read, so
  * a false positive costs one file's I/O, never correctness.
  */
object BloomSkip {

  private val Buckets = 65536L

  /** Sketch-table name for `table`. */
  def sketchTable(table: String): String = table + "_bloomskip"

  /** Write `df` partitioned by `fileKeyCol` plus the per-file bitmap
    * sketch over `keyCol`. The sketch build is one distinct + one
    * map-side-combined bit_or aggregate — file-count·1024 rows out.
    */
  def writeWithBlooms(df: DataFrame, table: String, fileKeyCol: String,
                      keyCol: String): Unit = {
    Warehouse.writePartitioned(df, table, Seq(fileKeyCol))
    val stats = df
      .select(col(fileKeyCol),
        pmod(xxhash64(col(keyCol)), lit(Buckets)).as("__bkt"))
      .distinct()
      .groupBy(col(fileKeyCol),
        (col("__bkt") / 64).cast("long").as("word"))
      .agg(expr("bit_or(shiftleft(1L, cast(__bkt % 64 AS int)))")
        .as("bits"))
    Warehouse.writeTable(stats, sketchTable(table))
  }

  /** Point lookup `keyCol = value` over a [[writeWithBlooms]] table:
    * hash the probe value (one bounded in-session evaluation — the
    * 1-row query-vector pattern), consult the sketch for files whose
    * bitmap contains its bucket (driver-side; the word filter pushes so
    * ≤ one sketch row per file is read), prune to those partitions at
    * planning time, then apply the exact predicate.
    */
  def readPoint(spark: SparkSession, table: String, fileKeyCol: String,
                keyCol: String, value: Column): DataFrame = {
    // xxhash64 is TYPE-sensitive (an int and a bigint of the same value
    // hash differently), and writeWithBlooms hashed the table column's
    // own type — so the probe literal must be cast to the stored keyCol
    // type before hashing, or a type-mismatched probe lands in the wrong
    // bucket and silently prunes away the correct files.
    val keyType = Warehouse.read(spark, table).schema(keyCol).dataType
    val typedValue = value.cast(keyType)
    val b = spark.range(1)
      .select(pmod(xxhash64(typedValue), lit(Buckets)).as("b"))
      .collect()(0).getLong(0)
    val keep = Warehouse.read(spark, sketchTable(table))
      .filter(col("word") === b / 64 &&
        shiftright(col("bits"), (b % 64).toInt).bitwiseAND(lit(1L)) === 1L)
      .select(col(fileKeyCol)).collect().map(_.get(0)).toSeq
    Warehouse.read(spark, table)
      .filter(col(fileKeyCol).isin(keep: _*))
      .filter(col(keyCol) === typedValue)
  }
}
