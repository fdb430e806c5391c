package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Volume-anomaly detection over a keyed event stream: bucket events
  * into fixed windows per series key, then flag buckets whose count
  * sits more than `sigma` population standard deviations above that
  * series' mean — the monitoring sweep a crawl/ingest pipeline runs to
  * catch a crawler trap flooding one source, a log-replay duplicating
  * an hour, or an upstream outage (spikes AND the dead-air complement,
  * via `flagLow`).
  *
  * Exact integer algebra, no floats (so the result hashes identically
  * in any engine): with per-series totals T = #buckets, S = Σn,
  * SS = Σn², the z-test
  *     (n − S/T) ≥ σ·sqrt(SS/T − (S/T)²)
  * multiplies through by T² into
  *     (n·T − S)² ≥ σ²·(T·SS − S²)   with  n·T − S > 0
  * — every operand a BIGINT (n·T−S ≤ events·buckets ~ 10¹² at 100 TB
  * scale keeps the square inside int64 for per-series counts < ~3·10⁹;
  * the helper widens through DECIMAL(38,0) so even that bound is soft).
  * The strict `> 0` side condition makes a flat series (variance 0)
  * produce no flags instead of flagging every bucket.
  *
  * Scale shape: the raw stream reduces to the (key, bucket) count
  * matrix in ONE hash aggregate (map-side combined — the only pass
  * over event-scale data); series stats are a second tiny aggregate
  * over #buckets-scale rows, re-joined by series key. Cardinality
  * after the first aggregate is keys × span/bucket — independent of
  * event volume — so the flagging join is broadcast-sized in any
  * realistic deployment. No windows, no sorts, no per-key arrays.
  */
object Anomaly {

  /** Per-series stats over a (key, n) counts frame: (keyCol, __t, __s,
    * __ss) — the baseline the breach test runs against. Persist this
    * (it is keys-scale, not event-scale) to serve streaming alerts.
    */
  def seriesStats(counts: DataFrame, keyCol: String): DataFrame =
    counts
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("__t"),
        sum(col("n")).as("__s"),
        // DECIMAL(38,0) before squaring: n² at per-bucket counts past
        // ~3·10⁹ would wrap int64; decimal keeps the algebra exact
        sum(col("n").cast("decimal(38,0)") * col("n")).as("__ss"))

  /** The exact-integer breach predicate over a frame carrying
    * (n, __t, __s, __ss) — see the object doc for the algebra.
    */
  def breach(sigma: Int, flagLow: Boolean): Column = {
    val dev = col("n").cast("decimal(38,0)") * col("__t") - col("__s")
    val rhs = (col("__t").cast("decimal(38,0)") * col("__ss") -
      col("__s").cast("decimal(38,0)") * col("__s")) * (sigma.toLong * sigma)
    val high = dev > 0 && dev * dev >= rhs
    if (flagLow) high || (dev < 0 && dev * dev >= rhs) else high
  }

  /** Flagged buckets: (keyCol, bucket, n) where n's z-score vs the
    * series exceeds `sigma`.
    *
    * @param flagLow also flag buckets `sigma` BELOW the mean
    *                (n·T − S < 0 with the same squared inequality)
    */
  def spikeBuckets(events: DataFrame, keyCol: String, bucketCol: String,
                   sigma: Int, flagLow: Boolean = false): DataFrame = {
    require(sigma > 0, s"sigma must be positive, got $sigma")
    val counts = events
      .groupBy(col(keyCol), col(bucketCol))
      .agg(count(lit(1)).as("n"))
    counts.join(seriesStats(counts, keyCol), Seq(keyCol))
      .filter(breach(sigma, flagLow))
      .select(col(keyCol), col(bucketCol), col("n"))
  }

  /** CUSUM drift sweep — the change-point complement of [[spikeBuckets]]:
    * a z-test flags one loud bucket, but a SUSTAINED small shift (a
    * crawler quietly ingesting 10% hot, a source slowly going dark) never
    * trips any single-bucket test. The one-sided CUSUM statistic
    * accumulates deviation from the series mean and resets at zero:
    *     C_t = max(0, C_{t−1} + (n_t − mean))
    * and a bucket is flagged when C_t ≥ threshold (Page 1954 — the
    * classic sequential change-point detector).
    *
    * Exact integer algebra: with T buckets and S = Σn per series, the
    * per-bucket deviation scales through by T into d_t = n_t·T − S
    * (BIGINT — n·T wraps only past ~10¹⁸ event-bucket products), and the
    * recurrence rewrites to the closed window form
    *     C_t = S⁺_t − min(0, min_{i≤t} S⁺_i),   S⁺_t = Σ_{i≤t} d_i
    * (prefix sum minus its clamped running minimum — the identity that
    * turns the sequential fold into two window functions, the same
    * de-recursion trick as [[Sessionize]]'s session ids). Flag where
    * C_t ≥ thresholdCounts·T (threshold expressed in un-scaled counts of
    * cumulative drift).
    *
    * Scale shape: event-scale data is touched ONCE by the map-side-
    * combined (key, bucket) count aggregate; everything after runs on
    * the bucket matrix (keys × span/bucket rows, volume-independent).
    * The prefix windows partition by series key — per-key sequential
    * state never leaves one partition, keys parallelize freely.
    *
    * Output: (keyCol, bucketCol, n, cusum) for flagged buckets only,
    * `cusum` in the scaled n·T units (BIGINT, engine-exact).
    */
  def cusumDrift(events: DataFrame, keyCol: String, bucketCol: String,
                 thresholdCounts: Long): DataFrame = {
    require(thresholdCounts > 0,
      s"thresholdCounts must be positive, got $thresholdCounts")
    import org.apache.spark.sql.expressions.Window
    val counts = events
      .groupBy(col(keyCol), col(bucketCol))
      .agg(count(lit(1)).as("n"))
    val stats = counts.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__t"), sum(col("n")).as("__s"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
    counts.join(stats, Seq(keyCol))
      .withColumn("__ps", sum(col("n") * col("__t") - col("__s")).over(w))
      .withColumn("cusum",
        col("__ps") - least(min(col("__ps")).over(w), lit(0L)))
      .filter(col("cusum") >= col("__t") * thresholdCounts)
      .select(col(keyCol), col(bucketCol), col("n"), col("cusum"))
  }
}
