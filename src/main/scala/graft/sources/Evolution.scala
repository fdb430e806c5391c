package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition evolution — the Iceberg/Delta capability of CHANGING a
  * table's partitioning without rewriting history: rows before the
  * cutover stay in the old (coarse, e.g. monthly) layout, rows after it
  * land in the new (fine, e.g. weekly) layout, and every read goes
  * through one view that prunes EACH generation on its own partition
  * key. The operational point: re-partitioning a 100 TB table in place
  * is a full rewrite; evolution is a metadata change plus fine
  * partitions for new data only — old files are NEVER touched at
  * cutover.
  *
  * Here a generation is a physical table (`_g0` coarse, `_g1` fine) and
  * the "metadata" is the cutover value; the read-side contract is the
  * interesting part: a range probe must translate its predicate into
  * BOTH generations' partition vocabularies (months for g0, weeks for
  * g1 — the caller supplies the day→key arithmetic since only it knows
  * the encoding), prune each at planning time, and union. The exact
  * row predicate still runs over what is read — generation routing can
  * only cost I/O, never correctness (the [[ZoneMap]] doctrine).
  */
object Evolution {

  /** Write `df` as two generations split on `cutoverCoarse`: rows with
    * `coarseCol` < cutover partitioned by `coarseCol` (history), the
    * rest partitioned by `fineCol` (new data). Each row lands in
    * exactly one generation — the split predicate is on the coarse key
    * both sides carry.
    */
  def writeEvolved(df: DataFrame, table: String, coarseCol: String,
                   fineCol: String, cutoverCoarse: Long): Unit = {
    Warehouse.writePartitioned(
      df.filter(col(coarseCol) < cutoverCoarse), table + "_g0",
      Seq(coarseCol))
    Warehouse.writePartitioned(
      df.filter(col(coarseCol) >= cutoverCoarse), table + "_g1",
      Seq(fineCol))
  }

  /** Range probe over a [[writeEvolved]] table: `lo ≤ probeCol ≤ hi`
    * with per-generation partition bounds supplied in each generation's
    * own key vocabulary (`coarseLo..coarseHi` for g0, `fineLo..fineHi`
    * for g1 — conservative bounds derived from [lo, hi] by the caller's
    * key arithmetic). Each generation's scan prunes at planning time on
    * its own partition column; the exact probe predicate is the
    * residual on both.
    */
  def readRange(spark: SparkSession, table: String, coarseCol: String,
                fineCol: String, probeCol: String, lo: Long, hi: Long,
                coarseLo: Long, coarseHi: Long, fineLo: Long,
                fineHi: Long): DataFrame = {
    val g0 = Warehouse.read(spark, table + "_g0")
      .filter(col(coarseCol).between(coarseLo, coarseHi))
      .filter(col(probeCol).between(lo, hi))
    val g1 = Warehouse.read(spark, table + "_g1")
      .filter(col(fineCol).between(fineLo, fineHi))
      .filter(col(probeCol).between(lo, hi))
    g0.select(g1.columns.map(col): _*).unionByName(g1)
  }

  /** SCHEMA evolution — the other Iceberg evolution face (spec
    * §schema-evolution): columns get ADDED, RENAMED, or type-PROMOTED
    * over a table's life, and history is NEVER rewritten — files written
    * under the old schema stay as they are, and the read side presents
    * every generation under the CURRENT schema via a name mapping.
    * Generations here are physical tables (`_s0` pre-evolution, `_s1`
    * current), both partitioned on the same key; the name mapping is the
    * caller-supplied `renames` (old name → current name — the metadata
    * Iceberg keeps as field-id ↔ name tables).
    */
  def writeSchemaGenerations(g0: DataFrame, g1: DataFrame, table: String,
                             partCol: String): Unit = {
    Warehouse.writePartitioned(g0, table + "_s0", Seq(partCol))
    Warehouse.writePartitioned(g1, table + "_s1", Seq(partCol))
  }

  /** Read a [[writeSchemaGenerations]] table under the CURRENT (`_s1`)
    * schema: old-generation columns are renamed through the mapping
    * (a metadata-only projection), columns the evolution ADDED read as
    * typed NULLs for pre-evolution rows (exactly Iceberg's contract —
    * an added column has no value in old files), columns whose type was
    * promoted read back CAST to the current type, and columns the
    * evolution DROPPED simply aren't selected. All of this is
    * projection-level, so partition predicates a caller stacks on top
    * still push past it to BOTH generations' scans and prune at
    * planning time (ZoneMapSpec pins it) — schema routing, like
    * generation routing, can only shape the plan, never the rows.
    */
  def readEvolvedSchema(spark: SparkSession, table: String,
                        renames: Map[String, String]): DataFrame = {
    val g1 = Warehouse.read(spark, table + "_s1")
    val g0raw = Warehouse.read(spark, table + "_s0")
    val missing = renames.keys.filterNot(g0raw.columns.contains)
    require(missing.isEmpty,
      s"renames name columns absent from ${table}_s0: ${missing.mkString(",")}")
    val g0named = renames.foldLeft(g0raw) { case (d, (o, n)) =>
      d.withColumnRenamed(o, n)
    }
    // added columns: in the current schema, unknown to the old one
    val added = g1.schema.filterNot(f => g0named.columns.contains(f.name))
    val g0full = added.foldLeft(g0named)((d, f) =>
      d.withColumn(f.name, lit(null).cast(f.dataType)))
    // type promotion: the current type wins (Iceberg int→long etc.)
    val g0cast = g1.schema.foldLeft(g0full)((d, f) =>
      if (d.schema(f.name).dataType != f.dataType)
        d.withColumn(f.name, col(f.name).cast(f.dataType))
      else d)
    g0cast.select(g1.columns.map(col): _*).unionByName(g1)
  }
}
