package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WRITE–AUDIT–PUBLISH: the data-quality gate every production lakehouse
  * append runs (Iceberg's WAP pattern / Delta constraints / dbt tests as
  * an engine primitive). A candidate batch is AUDITED against declared
  * expectations — null-rate, value bounds, volume floor — and PUBLISHED
  * into the target table only when every expectation holds; a failing
  * batch aborts without a byte landing in the table. For a 100 TB
  * training corpus this is the ingestion contract: a poisoned crawl
  * drop (nulled keys, zeroed prices, an empty day) is stopped at the
  * staging boundary instead of silently joining the corpus.
  *
  * Scale shape: the audit is ONE aggregate pass over the batch — every
  * expectation's observed value is an aggregate column of the same job
  * (one scan, map-side combined, no matter how many expectations), then
  * a bounded Expand melts the 1-row result into per-expectation rows.
  * The publish decision collects that bounded audit frame (rows =
  * #expectations, never data-scale). The append itself is
  * [[Warehouse]]-managed: O(batch), never rewriting the table.
  */
object Wap {

  /** One expectation: `observed` is an AGGREGATE expression over the
    * batch (evaluated in the single audit pass, cast to long);
    * the expectation passes iff lo <= observed <= hi. A NULL observed
    * (e.g. max() over zero rows) fails — absence of evidence is not
    * a pass.
    */
  final case class Expect(name: String, observed: Column, lo: Long, hi: Long)

  /** Audit `batch` against `expects`: returns the bounded frame
    * (expectation, observed, lo, hi, passed) — one row per expectation,
    * all observed values computed in ONE aggregate over the batch.
    */
  def audit(batch: DataFrame, expects: Seq[Expect]): DataFrame = {
    require(expects.nonEmpty, "audit needs at least one expectation")
    val aggs = expects.map(e => e.observed.cast("long").as(e.name))
    val one = batch.agg(aggs.head, aggs.tail: _*)
    // stack = one Expand of the 1-row aggregate into expectation rows;
    // per-name bounds attach as a literal when-chain (bounded metadata,
    // not data)
    val stacked = one.select(expr(
      s"stack(${expects.size}, " +
        expects.map(e => s"'${e.name}', `${e.name}`").mkString(", ") +
        ") AS (expectation, observed)"))
    def bound(f: Expect => Long): Column =
      expects.foldLeft(lit(null).cast("long")) { (acc, e) =>
        when(col("expectation") === e.name, lit(f(e))).otherwise(acc)
      }
    stacked
      .withColumn("lo", bound(_.lo))
      .withColumn("hi", bound(_.hi))
      .withColumn("passed",
        when(col("observed").isNotNull &&
          col("observed").between(col("lo"), col("hi")), 1L).otherwise(0L))
  }

  /** Publish `batch` into `table` iff every audit row passed. The
    * decision reads the BOUNDED audit frame (one row per expectation);
    * the append is positional-safe (stored-schema reorder, the
    * appendPartitioned hardening). Returns whether the batch landed.
    */
  def publishIfClean(batch: DataFrame, auditRows: DataFrame,
                     table: String): Boolean = {
    val clean = auditRows.agg(min(col("passed"))).collect()(0).getLong(0) == 1L
    if (clean) {
      val stored = batch.sparkSession.table(table).columns
      batch.select(stored.map(col): _*)
        .write.mode("append").format("parquet").insertInto(table)
      // appends do NOT drop the catalog entry (unlike writeTable's
      // DROP+recreate), so any session that already read the table holds
      // a cached file listing that silently misses the new files — under
      // foreachBatch the write runs on the micro-batch's CLONED session
      // while the caller reads from the outer one (found the hard way:
      // rows on disk, reads stale). refreshTable invalidates the shared
      // relation cache so every session re-lists.
      batch.sparkSession.catalog.refreshTable(table)
    }
    clean
  }
}
