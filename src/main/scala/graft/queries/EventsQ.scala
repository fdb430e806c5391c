package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Sessionize

/** Event-stream batch operators: sessionization (gap-based), tumbling-
  * window rollups (the batch equivalent of the streaming job in
  * graft.streaming), JSON prop extraction, and the order-sensitive
  * min-spacing sweep (Tegallega W7 — typed fold; no window function can
  * express it, but a row-at-a-time recursive CTE carrying the last-kept
  * timestamp per user oracles it exactly).
  */
object EventsQ extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e01_sessionize" -> { (s, dir) =>
      val ev = Tables(s, dir).events
        .withColumn("ts_us", unix_micros(col("ts")))
      Sessionize.sessionize(ev, "user_id", "ts_us", "event_id",
          gapMs = 1800L * 1000000) // 30 min in µs
        .groupBy(col("user_id"))
        .agg(max(col("session_index")).cast("bigint").as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },

    "e02_hourly_rollup" -> { (s, dir) =>
      Tables(s, dir).events
        .groupBy(unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          (sum(round(col("value") * 100).cast("bigint")).cast("double") / 100)
            .as("sum_value"))
        .orderBy(col("hour_ms"), col("event_type"))
    },

    "e03_min_spacing_sweep" -> { (s, dir) =>
      val ev = Tables(s, dir).events
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"))
      Sessionize.minSpacingSweep(ev, "user_id", "ts_us", "event_id",
          minGapMs = 60L * 1000000) // 60 s in µs
        .orderBy(col("user_id"), col("ts_us"))
    },

    // COMPLEX EVENT PATTERNS (operators/Cep): regex CEP over per-user
    // symbol sequences — the MATCH_RECOGNIZE capability class. One
    // exchange on user_id, per-key bounded state, codegen'd regexp_count;
    // patterns: error bursts (>=3 consecutive), signup-to-first-purchase,
    // view-then-purchase with only clicks/errors between.
    "e18_pattern_matches" -> { (s, dir) =>
      graft.operators.Cep.patternCounts(Tables(s, dir).events,
        "user_id", "ts", "event_id",
        symbol = substring(col("event_type"), 1, 1),
        patterns = Seq("e{3,}", "s[^p]*p", "v[ce]*p"))
    },

    "e04_json_props_rollup" -> { (s, dir) =>
      Tables(s, dir).events
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    },

    // As-of join: every non-purchase event picks up the user's latest
    // preceding purchase (union + carry-forward window — one shuffle on
    // user_id; the oracle is DuckDB's native ASOF LEFT JOIN).
    "e05_asof_last_purchase" -> { (s, dir) =>
      val ev = Tables(s, dir).events
        .withColumn("ts_us", unix_micros(col("ts")))
      val right = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts_us"))
        .agg(max(col("event_id")).as("ref_id"))
      val left = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("ts_us"), col("event_id"))
      graft.operators.AsofJoin.asofJoin(left, right, "user_id", "ts_us")
        .orderBy(col("user_id"), col("ts_us"), col("event_id"))
    },

    // Ordered funnel view → click → purchase with first-touch
    // sequential matching (stage i = earliest stage-i event STRICTLY
    // after stage i-1's time): per-user reached stage rolled up to
    // stage counts; users with no funnel-relevant events count as 0.
    "e06_funnel_stages" -> { (s, dir) =>
      val ev = Tables(s, dir).events
        .withColumn("ts_us", unix_micros(col("ts")))
      val f = graft.operators.Funnel.funnelStages(ev, "user_id",
        "event_type", "ts_us", Seq("view", "click", "purchase"),
        windowUs = 24L * 3600 * 1000000) // 24 h conversion window
      ev.select(col("user_id")).distinct()
        .join(f, Seq("user_id"), "left")
        .select(coalesce(col("reached"), lit(0)).as("reached"))
        .groupBy(col("reached")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("reached"))
    },

    // Cohort retention triangle: users bucketed by first-signup week,
    // distinct-user activity counts at week offsets 0..8 (operator doc
    // pins the semantics: any event type counts as activity, pre-cohort
    // activity discarded, offset 0 includes the signup itself).
    "e07_cohort_retention" -> { (s, dir) =>
      val ev = Tables(s, dir).events
        .withColumn("ts_us", unix_micros(col("ts")))
      graft.operators.Cohort.retention(ev, "user_id", "event_type",
          "ts_us", "signup",
          bucketUs = 7L * 86400 * 1000000, maxOffset = 8)
        .orderBy(col("cohort_bucket"), col("week_offset"))
    },

    // Volume-anomaly sweep: hourly counts per event_type, flag hours
    // beyond ±3 population-σ of that type's series (both directions —
    // traffic floods AND dead air). Exact integer z-test, no floats
    // (operators.Anomaly doc derives the squared inequality).
    "e08_spike_hours" -> { (s, dir) =>
      val ev = Tables(s, dir).events
        .withColumn("hour_ms", unix_millis(date_trunc("hour", col("ts"))))
      graft.operators.Anomaly
        .spikeBuckets(ev, "event_type", "hour_ms", sigma = 3,
          flagLow = true)
        .orderBy(col("event_type"), col("hour_ms"))
    },

    // Binned interval join (attribution): each error event matched to
    // every same-user post-purchase window [purchase, +2 h) containing
    // it. The engine runs the grid method — intervals replicated to the
    // 1 h bins they overlap, points tagged with their one bin, equi-join
    // then exact residual — while the oracle runs the naive inequality
    // join; identical output proves the binning is a pure plan rewrite.
    "e09_interval_attribution" -> { (s, dir) =>
      val ev = Tables(s, dir).events
        .withColumn("ts_us", unix_micros(col("ts")))
      val iv = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("lo"),
          (col("ts_us") + 7200000000L).as("hi"),
          col("event_id").as("ref_id"))
      val pts = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts_us"), col("event_id"))
      graft.operators.Intervals
        .pointInInterval(pts, iv, "user_id", "ts_us", "lo", "hi",
          binWidth = 3600000000L) // 1 h bins vs 2 h intervals
        .select(col("user_id"), col("event_id"), col("ref_id"),
          col("ts_us"))
        .orderBy(col("user_id"), col("event_id"), col("ref_id"))
    },

    // CUSUM drift sweep: hours where the per-type hourly count series
    // has accumulated ≥ 25 counts of sustained positive drift vs the
    // series mean (change-point detection — the slow-shift complement
    // of e08's single-bucket z-test; operators.Anomaly derives the
    // integer window form of the Page recurrence).
    "e10_cusum_drift" -> { (s, dir) =>
      val ev = Tables(s, dir).events
        .withColumn("hour_ms", unix_millis(date_trunc("hour", col("ts"))))
      graft.operators.Anomaly
        .cusumDrift(ev, "event_type", "hour_ms", thresholdCounts = 25)
        .orderBy(col("event_type"), col("hour_ms"))
    },

    // Trailing-7-day distinct active users per event type — the WAU
    // metric. `COUNT(DISTINCT) OVER (RANGE ...)` is inexpressible as a
    // window function in Spark; SlidingDistinct's interval-coverage
    // decomposition (distinct activity → lag-deduped ±1 deltas → day
    // grid prefix sum) computes it exactly with no per-window user
    // sets. The oracle recomputes each day's window with a correlated
    // COUNT(DISTINCT) — the definitional form.
    "e11_sliding_distinct_users" -> { (s, dir) =>
      val ev = Tables(s, dir).events
        .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      graft.operators.SlidingDistinct
        .slidingDistinct(ev, "event_type", "user_id", "day",
          windowDays = 7)
        .orderBy(col("event_type"), col("day"))
    },

    // First-order user-journey transition matrix: which event type
    // follows which, with exact integer basis-point rates (Markov doc
    // has the entity-window → pair-agg → keys-scale-normalize shape).
    "e12_event_transitions" -> { (s, dir) =>
      graft.operators.Markov
        .transitionMatrix(Tables(s, dir).events, "user_id", "event_type",
          Seq("ts", "event_id"))
        .orderBy(col("from_state"), col("to_state"))
    },

    // Time-series regularization: resample each series to its full
    // daily grid and FORWARD-FILL gaps with the last observation — the
    // pre-step of every downstream window model (a sliding stat over
    // an irregular series silently weights by observation density).
    // Grid = per-series min..max day via one keys-scale aggregate +
    // sequence explode (day-scale rows, not event-scale); the fill is
    // last(ignoreNulls) over the series window — one exchange on the
    // series key; `is_observed` keeps the imputation auditable.
    "e16_gap_fill_ffill" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables(s, dir).events
        .withColumn("day", expr("unix_micros(ts) div 86400000000"))
        .groupBy(col("event_type"), col("day"))
        .agg(max(round(col("value") * 100).cast("bigint"))
          .as("close_cents"))
      val grid = daily.groupBy(col("event_type"))
        .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"))).as("day"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          last(col("close_cents"), ignoreNulls = true).over(w)
            .as("filled_cents"),
          col("close_cents").isNotNull.as("is_observed"))
        .orderBy(col("event_type"), col("day"))
    },

    // Watermark lateness audit (operators/Lateness): synthesize a
    // deterministic arrival time (event time + a per-event hash-ish
    // lateness, exact integer math both engines), compute the arrival-
    // order event-time high-water mark with the two-phase prefix max,
    // then count what candidate watermark delays {30s, 120s, 600s}
    // would drop — the number that decides the streaming faces'
    // withWatermark settings. The 3-way delay fan-out is a bounded
    // explode AFTER the prefix pass (one data exchange total).
    "e17_watermark_audit" -> { (s, dir) =>
      val delays = Seq(30L, 120L, 600L)
      val ev = Tables(s, dir).events.select(
        unix_millis(col("ts")).as("ts_ms"), col("event_id"))
        .withColumn("arrival_ms", col("ts_ms") +
          (col("event_id") % 997) * (col("event_id") % 31) % 600 * 1000L)
      graft.operators.Lateness
        .withHighWater(ev, "ts_ms", "arrival_ms", "event_id")
        .select(explode(array(delays.map(d => struct(
          lit(d).as("delay_s"),
          (col("high_water").isNotNull &&
            col("ts_ms") < col("high_water") - lit(d * 1000L))
            .cast("long").as("dropped"))): _*)).as("x"))
        .groupBy(col("x.delay_s").as("delay_s"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("x.dropped")).as("n_dropped"))
        .orderBy(col("delay_s"))
    },

    // Per-user activity features — the feature-extraction shape of a
    // churn/engagement model: event count, active-day count, first/last
    // day, and the activity TREND as the exact-integer OLS slope over
    // (day, daily count) pairs kept as a rational
    // (num = n·Σxy − Σx·Σy, den = n·Σx² − (Σx)² — translation-invariant,
    // so absolute epoch days are safe in long arithmetic; downstream
    // divides, engines never do). Two map-side-combined aggregates
    // keyed (user, day) then (user); nothing else moves.
    "e15_user_features" -> { (s, dir) =>
      val daily = Tables(s, dir).events
        .withColumn("day", expr("unix_micros(ts) div 86400000000"))
        .groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("y"))
      daily.groupBy(col("user_id"))
        .agg(sum(col("y")).as("n_events"),
          count(lit(1)).as("active_days"),
          min(col("day")).as("first_day"),
          max(col("day")).as("last_day"),
          (count(lit(1)) * sum(col("day") * col("y")) -
            sum(col("day")) * sum(col("y"))).as("slope_num"),
          (count(lit(1)) * sum(col("day") * col("day")) -
            sum(col("day")) * sum(col("day"))).as("slope_den"))
        .orderBy(col("user_id"))
    },

    // Conversion-lag distribution: per user, first view → first
    // purchase AT-OR-AFTER it, exact integer seconds, discrete
    // median/p90 over converters — the funnel-timing rollup (e06 tells
    // you WHO converts; this tells you HOW LONG it takes). Two keyed
    // aggregates + one user join; the lag frame is user-scale.
    "e14_conversion_lag" -> { (s, dir) =>
      val ev = Tables(s, dir).events
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"))
        .agg(min(unix_micros(col("ts"))).as("v_us"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
      val lag = v.join(p, Seq("user_id"))
        .filter(col("p_us") >= col("v_us"))
        .groupBy(col("user_id"), col("v_us"))
        .agg(min(col("p_us")).as("p_us"))
        .select(expr("(p_us - v_us) div 1000000").as("lag_s"))
      lag.agg(count(lit(1)).as("n_converted"),
        expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY lag_s) " +
          "AS BIGINT)").as("median_lag_s"),
        expr("CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY lag_s) " +
          "AS BIGINT)").as("p90_lag_s"))
    },

    // Robust outlier counts via MAD (median absolute deviation) — the
    // heavy-tail-safe complement of e08's mean/σ z-test (one fat order
    // can't move a median). Exact integer cents; two dependent
    // percentile_disc aggregates (median, then median of deviations),
    // each a map-side-combinable agg with the keys-scale medians frame
    // BROADCAST back — the value stream shuffles on event_type once per
    // phase and never sorts globally. The 3·MAD cut is the standard
    // robust z (k·1.4826·MAD ≈ kσ under normality) kept in exact
    // integer form.
    "e13_mad_outliers" -> { (s, dir) =>
      val ev = Tables(s, dir).events.select(col("event_type"),
        round(col("value") * 100).cast("bigint").as("v"))
      val med = ev.groupBy(col("event_type"))
        .agg(expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v) " +
          "AS BIGINT)").as("med"))
      val dev = ev.join(broadcast(med), Seq("event_type"))
        .withColumn("dev", abs(col("v") - col("med")))
      val mad = dev.groupBy(col("event_type"))
        .agg(max(col("med")).as("med"),
          expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY dev) " +
            "AS BIGINT)").as("mad"),
          count(lit(1)).as("n"))
      dev.select(col("event_type"), col("dev"))
        .join(broadcast(mad), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(max(col("med")).as("med"), max(col("mad")).as("mad"),
          max(col("n")).as("n"),
          sum(when(col("dev") > col("mad") * 3, 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy(col("event_type"))
    }
  )

  def oracle: Map[String, String] = Map(
    "e01_sessionize" ->
      """WITH g AS (
        | SELECT user_id,
        |  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |       THEN 1 ELSE 0 END AS nw
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, CAST(SUM(nw) AS BIGINT) AS n_sessions,
        | COUNT(*) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "e02_hourly_rollup" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100 AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_ms, event_type""".stripMargin,

    // The sequential keep/drop fold, mirrored as a recursive CTE that
    // steps one row per user per iteration (rn = rn+1), carrying the
    // last-kept timestamp — recursion depth = max rows per user (≤86 at
    // sf0.01), total state = one row per event.
    "e03_min_spacing_sweep" ->
      """WITH RECURSIVE o AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |walk(user_id, rn, ts_us, event_id, last_kept, kept) AS (
        |  SELECT user_id, rn, ts_us, event_id, ts_us, true FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.user_id, o.rn, o.ts_us, o.event_id,
        |    CASE WHEN o.ts_us - w.last_kept >= 60000000
        |         THEN o.ts_us ELSE w.last_kept END,
        |    o.ts_us - w.last_kept >= 60000000
        |  FROM walk w JOIN o ON o.user_id = w.user_id AND o.rn = w.rn + 1)
        |SELECT user_id, ts_us, event_id FROM walk WHERE kept
        |ORDER BY user_id, ts_us""".stripMargin,

    "e05_asof_last_purchase" ->
      """WITH r AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS ref_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |l AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id
        |  FROM events WHERE event_type <> 'purchase')
        |SELECT l.user_id, l.ts_us, l.event_id, r.ref_id AS asof_ref_id
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
        |ORDER BY l.user_id, l.ts_us, l.event_id""".stripMargin,

    // per-stage conditional-min chain: stage i's time = min ts of
    // stage-i events strictly after stage i-1's time and within the
    // 24 h window (first-touch sequential matching, mirrors the fold).
    "e06_funnel_stages" ->
      """WITH s1 AS (SELECT user_id, MIN(epoch_us(ts)) AS t FROM events
        |            WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t FROM events e
        |       JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t
        |         AND epoch_us(e.ts) <= s1.t + 86400000000
        |       GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t FROM events e
        |       JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t
        |         AND epoch_us(e.ts) <= s2.t + 86400000000
        |       GROUP BY e.user_id),
        |u AS (SELECT DISTINCT user_id FROM events)
        |SELECT CASE WHEN s3.user_id IS NOT NULL THEN 3
        |            WHEN s2.user_id IS NOT NULL THEN 2
        |            WHEN s1.user_id IS NOT NULL THEN 1
        |            ELSE 0 END AS reached,
        | COUNT(*) AS n_users
        |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        | LEFT JOIN s3 USING (user_id)
        |GROUP BY 1 ORDER BY reached""".stripMargin,

    // cohort = first-signup week (integer µs-epoch division — `//`
    // floors, Spark's `div` truncates, identical on the non-negative
    // epochs here); activity reduces to DISTINCT (user, week) before
    // the join, mirroring the operator's shape; count(*) over the
    // functional (user → cohort) join = distinct users per cell.
    "e07_cohort_retention" ->
      """WITH c AS (
        |  SELECT user_id, MIN(epoch_us(ts)) // 604800000000 AS cohort_bucket
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk
        |      FROM events)
        |SELECT c.cohort_bucket, a.wk - c.cohort_bucket AS week_offset,
        | COUNT(*) AS n_entities
        |FROM a JOIN c ON a.user_id = c.user_id
        |WHERE a.wk - c.cohort_bucket BETWEEN 0 AND 8
        |GROUP BY 1, 2 ORDER BY cohort_bucket, week_offset""".stripMargin,

    // the exact-integer three-sigma test: (n·T−S)² ≥ 9·(T·SS−S²) with
    // n·T−S ≠ 0; squares go through HUGEINT (BIGINT·BIGINT would wrap)
    // — predicate-only, so the internal width never reaches the output
    "e08_spike_hours" ->
      """WITH h AS (
        |  SELECT event_type, epoch_ms(date_trunc('hour', ts)) AS hour_ms,
        |         COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, COUNT(*) AS t, SUM(n) AS s,
        |         SUM(CAST(n AS HUGEINT) * n) AS ss
        |  FROM h GROUP BY 1)
        |SELECT h.event_type, h.hour_ms, h.n
        |FROM h JOIN st USING (event_type)
        |WHERE CAST(h.n AS HUGEINT) * st.t - st.s <> 0
        |  AND (CAST(h.n AS HUGEINT) * st.t - st.s)
        |      * (CAST(h.n AS HUGEINT) * st.t - st.s)
        |      >= 9 * (CAST(st.t AS HUGEINT) * st.ss
        |              - CAST(st.s AS HUGEINT) * st.s)
        |ORDER BY event_type, hour_ms""".stripMargin,

    "e18_pattern_matches" ->
      """WITH seq AS (
        |  SELECT user_id,
        |         string_agg(substr(event_type, 1, 1), ''
        |                    ORDER BY ts, event_id) AS s
        |  FROM (SELECT user_id, event_type, ts, event_id,
        |          row_number() OVER (PARTITION BY user_id
        |                             ORDER BY ts, event_id) AS rn
        |        FROM events)
        |  WHERE rn <= 1048576
        |  GROUP BY user_id),
        |pats AS (SELECT unnest(['e{3,}', 's[^p]*p', 'v[ce]*p']) AS pattern),
        |m AS (SELECT pattern, len(regexp_extract_all(s, pattern)) AS m
        |      FROM seq CROSS JOIN pats)
        |SELECT pattern,
        |       CAST(SUM(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_keys_matched,
        |       CAST(SUM(m) AS BIGINT) AS total_matches
        |FROM m GROUP BY pattern ORDER BY pattern""".stripMargin,

    "e04_json_props_rollup" ->
      """SELECT event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        | MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
        | MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the naive inequality join the engine's binned plan must equal
    "e09_interval_attribution" ->
      """WITH p AS (
        |  SELECT user_id, epoch_us(ts) AS lo,
        |         epoch_us(ts) + 7200000000 AS hi, event_id AS ref_id
        |  FROM events WHERE event_type = 'purchase'),
        |e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id
        |  FROM events WHERE event_type = 'error')
        |SELECT e.user_id, e.event_id, p.ref_id, e.ts_us
        |FROM e JOIN p ON e.user_id = p.user_id
        |  AND e.ts_us >= p.lo AND e.ts_us < p.hi
        |ORDER BY e.user_id, e.event_id, p.ref_id""".stripMargin,

    // prefix sum of the T-scaled deviation minus its clamped running
    // min = the Page CUSUM recurrence in closed window form
    "e10_cusum_drift" ->
      """WITH h AS (
        |  SELECT event_type, epoch_ms(date_trunc('hour', ts)) AS hour_ms,
        |         COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, COUNT(*) AS t, SUM(n) AS s
        |       FROM h GROUP BY 1),
        |ps AS (
        |  SELECT h.event_type, h.hour_ms, h.n, st.t,
        |    SUM(h.n * st.t - st.s) OVER (PARTITION BY h.event_type
        |                                 ORDER BY h.hour_ms) AS sp
        |  FROM h JOIN st USING (event_type)),
        |c AS (
        |  SELECT event_type, hour_ms, n, t,
        |    sp - LEAST(MIN(sp) OVER (PARTITION BY event_type
        |                             ORDER BY hour_ms), 0) AS cusum
        |  FROM ps)
        |SELECT event_type, hour_ms, n, CAST(cusum AS BIGINT) AS cusum
        |FROM c WHERE cusum >= 25 * t
        |ORDER BY event_type, hour_ms""".stripMargin,

    // the definitional correlated COUNT(DISTINCT) per (type, day) —
    // fine at oracle scale, quadratic at engine scale (which is why
    // the engine runs the coverage decomposition instead)
    "e11_sliding_distinct_users" ->
      """WITH a AS (
        |  SELECT DISTINCT event_type, user_id,
        |         epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |days AS (
        |  SELECT event_type, unnest(generate_series(MIN(day), MAX(day)))
        |           AS day
        |  FROM a GROUP BY event_type)
        |SELECT d.event_type, d.day,
        | (SELECT COUNT(DISTINCT a2.user_id) FROM a a2
        |  WHERE a2.event_type = d.event_type
        |    AND a2.day BETWEEN d.day - 6 AND d.day) AS n_distinct
        |FROM days d ORDER BY d.event_type, d.day""".stripMargin,

    "e12_event_transitions" ->
      """WITH seq AS (
        |  SELECT event_type AS to_state,
        |         LAG(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS from_state
        |  FROM events),
        |c AS (
        |  SELECT from_state, to_state, COUNT(*) AS n
        |  FROM seq WHERE from_state IS NOT NULL GROUP BY 1, 2)
        |SELECT from_state, to_state, CAST(n AS BIGINT) AS n,
        |  CAST(n * 10000 // SUM(n) OVER (PARTITION BY from_state)
        |       AS BIGINT) AS rate_bp
        |FROM c ORDER BY from_state, to_state""".stripMargin,

    "e16_gap_fill_ffill" ->
      """WITH d AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         MAX(CAST(round(value*100) AS BIGINT)) AS close_cents
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, MIN(day) AS lo, MAX(day) AS hi
        |      FROM d GROUP BY 1),
        |g AS (SELECT event_type, unnest(generate_series(lo, hi)) AS day
        |      FROM b),
        |j AS (
        |  SELECT g.event_type, g.day, d.close_cents
        |  FROM g LEFT JOIN d USING (event_type, day))
        |SELECT event_type, day,
        |  last_value(close_cents IGNORE NULLS) OVER (
        |    PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS filled_cents,
        |  close_cents IS NOT NULL AS is_observed
        |FROM j ORDER BY event_type, day""".stripMargin,

    // mirrors Lateness.withHighWater + the delay fan-out: hw = exclusive
    // running max of event time in (arrival, event_id) order
    "e17_watermark_audit" ->
      """WITH ev AS (
        |  SELECT epoch_ms(ts) AS ts_ms, event_id,
        |    epoch_ms(ts) + ((event_id % 997) * (event_id % 31)) % 600
        |      * 1000 AS arrival_ms
        |  FROM events),
        |h AS (
        |  SELECT ts_ms,
        |    MAX(ts_ms) OVER (ORDER BY arrival_ms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hw
        |  FROM ev),
        |d AS (SELECT * FROM (VALUES (30), (120), (600)) AS t(delay_s))
        |SELECT CAST(d.delay_s AS BIGINT) AS delay_s,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN h.hw IS NOT NULL
        |                 AND h.ts_ms < h.hw - d.delay_s * 1000
        |            THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        |FROM h CROSS JOIN d
        |GROUP BY d.delay_s ORDER BY delay_s""".stripMargin,

    "e15_user_features" ->
      """WITH d AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |         COUNT(*) AS y
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id,
        |  CAST(SUM(y) AS BIGINT) AS n_events,
        |  COUNT(*) AS active_days,
        |  MIN(day) AS first_day, MAX(day) AS last_day,
        |  CAST(COUNT(*) * SUM(day * y) - SUM(day) * SUM(y) AS BIGINT)
        |    AS slope_num,
        |  CAST(COUNT(*) * SUM(day * day) - SUM(day) * SUM(day) AS BIGINT)
        |    AS slope_den
        |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin,

    "e14_conversion_lag" ->
      """WITH v AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS v_us
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |p AS (
        |  SELECT user_id, epoch_us(ts) AS p_us
        |  FROM events WHERE event_type = 'purchase'),
        |fp AS (
        |  SELECT v.user_id, v.v_us, MIN(p.p_us) AS p_us
        |  FROM v JOIN p ON p.user_id = v.user_id AND p.p_us >= v.v_us
        |  GROUP BY 1, 2),
        |l AS (SELECT (p_us - v_us) // 1000000 AS lag_s FROM fp)
        |SELECT COUNT(*) AS n_converted,
        |  CAST(quantile_disc(lag_s, 0.5) AS BIGINT) AS median_lag_s,
        |  CAST(quantile_disc(lag_s, 0.9) AS BIGINT) AS p90_lag_s
        |FROM l""".stripMargin,

    "e13_mad_outliers" ->
      """WITH e AS (
        |  SELECT event_type, CAST(round(value*100) AS BIGINT) AS v
        |  FROM events),
        |m AS (
        |  SELECT event_type, quantile_disc(v, 0.5) AS med
        |  FROM e GROUP BY 1),
        |d AS (
        |  SELECT e.event_type, med, abs(v - med) AS dev
        |  FROM e JOIN m USING (event_type)),
        |md AS (
        |  SELECT event_type, MAX(med) AS med,
        |         quantile_disc(dev, 0.5) AS mad, COUNT(*) AS n
        |  FROM d GROUP BY 1)
        |SELECT d.event_type, CAST(MAX(md.med) AS BIGINT) AS med,
        |  CAST(MAX(md.mad) AS BIGINT) AS mad, MAX(md.n) AS n,
        |  CAST(SUM(CASE WHEN d.dev > md.mad*3 THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_outliers
        |FROM d JOIN md USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin
  )
}
