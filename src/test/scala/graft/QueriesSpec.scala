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
}
