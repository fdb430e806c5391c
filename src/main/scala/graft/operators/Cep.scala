package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Complex-event-pattern matching over per-key event sequences — the
  * batch face of the MATCH_RECOGNIZE / CEP capability class (Flink CEP,
  * Trino/Oracle MATCH_RECOGNIZE): each key's events are sequenced into a
  * symbol string and regular-expression patterns are counted over it.
  * Complements e06 (fixed-stage funnel) and e12 (first-order transition
  * matrix): a regex expresses arbitrary-length, gap-tolerant, repeated
  * patterns neither of those can (error bursts `e{2,}`, "view then
  * purchase with no intervening purchase" `v[^p]*p`).
  *
  * Scale shape: ONE hash exchange on the key (the same shuffle any
  * per-user sequence operator pays — Sessionize's shape); per-key state
  * is the user's own event string (bounded by per-entity activity, the
  * flatMapGroupsWithState contract), and the regex scan is a codegen'd
  * `regexp_count` over that bounded string — no self-joins, no windows,
  * no driver state. At 100 TB the plan is the same exchange + per-key
  * fold; a pathological mega-key is capped by `maxEventsPerKey` (the
  * hot-bucket doctrine: truncating a key's tail is explicit, not an OOM).
  *
  * Determinism: symbols are ordered by (ts, tiebreak) — a TOTAL order, so
  * the sequence string (and thus every count) is partition-invariant and
  * hash-matchable against a SQL `string_agg(... ORDER BY ts, tiebreak)`
  * mirror. Matches count NON-OVERLAPPING, leftmost-first occurrences —
  * the semantics both java.util.regex (Spark) and RE2-style engines
  * (DuckDB) give `regexp_count`/`regexp_extract_all` for the anchored-
  * free patterns used here.
  */
object Cep {

  /** Per-key symbol sequences: one row per key with the concatenated
    * symbol string (events ordered by `tsCol`, `tieCol`). `symbol` must
    * evaluate to a single-character string per event.
    *
    * The cap is enforced BEFORE aggregation by a row_number window over
    * the same total order — WindowExec sorts and spills per key, so a
    * pathological mega-key streams through disk and only its first
    * `maxEventsPerKey` events ever enter the collect_list buffer (a
    * post-aggregation slice would bound the output string but not the
    * aggregation buffer — the OOM it claims to prevent; the r12
    * window-gate doctrine). Same semantics: the kept events are the
    * leading prefix of the (ts, tie) order.
    *
    * The default cap is LOAD-BEARING memory protection, not a tuning
    * nicety: symbols are single characters, so 1<<20 bounds any one
    * key's aggregation-buffer string at ~1 MiB (~2 MiB as a Java
    * String) — size a larger cap against executor memory divided by
    * concurrent agg buffers before raising it.
    */
  def sequences(events: DataFrame, keyCol: String, tsCol: String,
                tieCol: String, symbol: Column,
                maxEventsPerKey: Int = 1 << 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), col("__tie"))
    events
      .select(col(keyCol), col(tsCol).as("__ts"), col(tieCol).as("__tie"),
        symbol.as("__sym"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxEventsPerKey)
      .groupBy(col(keyCol))
      // sort_array on the (ts, tie, sym) struct = total event order
      // (the window's partial order does not survive the aggregation)
      .agg(array_join(transform(
          sort_array(collect_list(struct(col("__ts"), col("__tie"),
            col("__sym")))),
          e => e.getField("__sym")), "")
        .as("seq"))
  }

  /** Count pattern occurrences per key and roll up per pattern:
    * (pattern, n_keys_matched, total_matches), ordered by pattern.
    * `patterns` are Java-regex strings over the symbol alphabet.
    */
  def patternCounts(events: DataFrame, keyCol: String, tsCol: String,
                    tieCol: String, symbol: Column,
                    patterns: Seq[String],
                    maxEventsPerKey: Int = 1 << 20): DataFrame = {
    val seqs = sequences(events, keyCol, tsCol, tieCol, symbol,
      maxEventsPerKey)
    // the patterns frame is a literal handful of rows — the cross join
    // is a broadcast of a bounded constant, not a data-scale product
    val pats = broadcast(
      seqs.sparkSession.createDataFrame(
        patterns.map(Tuple1(_))).toDF("pattern"))
    seqs.crossJoin(pats)
      .select(col("pattern"),
        regexp_count(col("seq"), col("pattern")).as("m"))
      .groupBy(col("pattern"))
      .agg(sum(when(col("m") > 0, 1L).otherwise(0L)).as("n_keys_matched"),
        sum(col("m")).as("total_matches"))
      .orderBy(col("pattern"))
  }
}
