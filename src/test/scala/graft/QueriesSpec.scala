package graft

/** Smoke: every declared query runs at sf0.001 and (except known-sparse
  * ones) returns rows; every oracle key refers to a real query.
  */
class QueriesSpec extends SparkTestBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sfSmoke)
      val n = df.count()
      assert(n >= 0)
      info(s"$name -> $n rows")
    }
  }

  // q15 has no DuckDB oracle by design (HLL/KLL sketch internals are
  // engine-specific) — pin its sketches to the EXACT counterparts
  // instead: approx_count_distinct against q12's exact distinct counts
  // (declared 2% rsd; assert 3× headroom), percentile_approx against
  // q16's exact discrete percentiles (1000-weight KLL on this data is
  // near-exact; assert within 2%). This is the strongest correctness
  // statement an approx operator admits.
  test("q15 sketches agree with the exact q12/q16 answers") {
    def byFlag(name: String, cols: Seq[String]): Map[String, Seq[Double]] =
      SparkEntry.queries(name)(spark, sfSmoke).collect()
        .map(r => r.getString(0) ->
          cols.map(c => r.getAs[Any](c).toString.toDouble))
        .toMap
    val approx = byFlag("q15_approx_stats",
      Seq("approx_parts", "p50_price", "p99_price"))
    val parts = byFlag("q12_distinct_parts_per_flag", Seq("n_parts"))
    val pct = byFlag("q16_exact_percentiles", Seq("p50_price", "p99_price"))
    assert(approx.keySet == parts.keySet && approx.keySet == pct.keySet)
    for (flag <- approx.keys) {
      val Seq(aParts, aP50, aP99) = approx(flag)
      assert(math.abs(aParts - parts(flag).head) <= 0.06 * parts(flag).head,
        s"$flag approx_parts $aParts vs exact ${parts(flag).head}")
      assert(math.abs(aP50 - pct(flag)(0)) <= 0.02 * pct(flag)(0),
        s"$flag p50 $aP50 vs exact ${pct(flag)(0)}")
      assert(math.abs(aP99 - pct(flag)(1)) <= 0.02 * pct(flag)(1),
        s"$flag p99 $aP99 vs exact ${pct(flag)(1)}")
    }
  }
}
