package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis: bucket every entity by the time of its
  * FIRST cohorting event (e.g. signup week), then count how many
  * distinct entities from each cohort were active again 0, 1, 2, …
  * buckets later — the classic product-analytics retention triangle,
  * and the corpus-freshness view a crawl pipeline runs over re-crawl
  * snapshots (cohort = first-seen week of a domain, activity =
  * re-observation).
  *
  * Semantics pinned here (and mirrored by the e07 SQL oracle):
  * - cohort bucket = floor(min ts of `cohortType` events / bucketUs);
  *   entities with no cohorting event are excluded entirely.
  * - an entity is "active at offset k" iff it has ANY event (of any
  *   type, including the cohorting event itself — offset 0 is always
  *   populated) in bucket cohort+k with 0 ≤ k ≤ maxOffset. Activity
  *   BEFORE the cohort bucket is discarded: retention measures what
  *   happens after entry, and a negative offset has no column in any
  *   retention chart.
  * - counts are DISTINCT entities, so event volume inside a bucket
  *   doesn't inflate retention.
  *
  * Scale shape: one hash exchange on the entity key builds the cohort
  * frame (a partial min aggregate — map-side combined); the activity
  * side reduces to DISTINCT (entity, bucket) pairs BEFORE the join —
  * also map-side combined, so at most (entities × maxOffset+1-ish)
  * rows ever reach the entity-keyed join; the final rollup groups on
  * (cohort, offset), whose cardinality is bounded by
  * observation-span² / bucket², independent of event volume. No
  * window functions, no per-entity arrays — every step is a hash
  * aggregate or equi-join, so a hot entity costs one combiner, not a
  * sort buffer.
  *
  * Timestamps must be non-negative epoch numerics (e.g. epoch micros):
  * `div` truncates toward zero while a floor-division oracle would
  * floor, and the two only agree on non-negative operands.
  */
object Cohort {

  /** Retention triangle: (cohort_bucket, week_offset, n_entities),
    * one row per populated (cohort, offset) cell.
    */
  def retention(events: DataFrame, entityCol: String, typeCol: String,
                tsCol: String, cohortType: String,
                bucketUs: Long, maxOffset: Int): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    require(maxOffset >= 0, s"maxOffset must be >= 0, got $maxOffset")
    val cohorts = events.filter(col(typeCol) === cohortType)
      .groupBy(col(entityCol))
      .agg(min(col(tsCol).cast("long")).as("__t0"))
      .select(col(entityCol),
        expr(s"__t0 div ${bucketUs}L").as("cohort_bucket"))
    // distinct (entity, bucket) BEFORE the join: the activity side the
    // join sees is bounded by entities × active buckets, not event rows
    val active = events
      .select(col(entityCol),
        expr(s"cast($tsCol as bigint) div ${bucketUs}L").as("__wk"))
      .distinct()
    // (entity, __wk) is distinct and entity → cohort_bucket is
    // functional, so every surviving row is one distinct active
    // (entity, cell) pair — count(*) IS the distinct-entity count
    active.join(cohorts, Seq(entityCol))
      .withColumn("week_offset", col("__wk") - col("cohort_bucket"))
      .filter(col("week_offset").between(0, maxOffset))
      .groupBy(col("cohort_bucket"), col("week_offset"))
      .agg(count(lit(1)).as("n_entities"))
  }
}
