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
    // names are spliced into the stack() SQL below as literals and
    // column references — restrict them so quoting can never break, and
    // duplicates can never alias two aggregate columns into ambiguity
    require(expects.forall(_.name.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"expectation names must be identifiers: ${expects.map(_.name)}")
    require(expects.map(_.name).distinct.size == expects.size,
      s"duplicate expectation names: ${expects.map(_.name)}")
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
    // appendPartitioned = the canonical positional-safe append +
    // post-append refreshTable (relation caches are per-session: under
    // foreachBatch the write runs on the micro-batch's CLONED session,
    // so readers on other sessions must refresh on their own — wapBatch
    // does)
    if (clean) Warehouse.appendPartitioned(batch, table)
    clean
  }
}
