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
}
