package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Skew}

/** Skew helpers must be pure plan rewrites: identical results to the
  * naive forms on real testdata, only the shuffle layout differs.
  */
class SkewSpec extends SparkTestBase {

  private lazy val t = Tables(spark, sfSmoke)

  test("saltedJoin equals the plain equi-join (inner and left)") {
    val big = t.orders.select("o_orderkey", "o_custkey")
      .withColumnRenamed("o_custkey", "c_custkey")
    val small = t.customer.select("c_custkey", "c_mktsegment")
    for (jt <- Seq("inner", "left")) {
      val plain = big.join(small, Seq("c_custkey"), jt)
      val salted = Skew.saltedJoin(big, small, "c_custkey", salts = 7, jt)
      assert(salted.count() == plain.count(), s"count differs for $jt")
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
        s"rows differ for $jt")
    }
  }

  test("saltedJoin rejects join types that would duplicate unmatched rows") {
    val big = t.orders.select(col("o_custkey").as("c_custkey"))
    val small = t.customer.select("c_custkey", "c_mktsegment")
    for (jt <- Seq("right", "full", "full_outer"))
      assertThrows[IllegalArgumentException](
        Skew.saltedJoin(big, small, "c_custkey", 7, jt))
  }

  test("simhash16 drops null-text docs like the exploded pipeline did") {
    import spark.implicits._
    val docs = Seq((1L, "hello world"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Dedup.simhash16(docs, "doc_id", "text").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    assert(!out.head.isNullAt(1))
  }

  test("skewSafeDistinctCount equals countDistinct") {
    val plain = t.lineitem.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_distinct"))
    val safe = Skew.skewSafeDistinctCount(t.lineitem, "l_returnflag", "l_partkey")
    val p = plain.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s = safe.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(p == s)
  }

  test("saltColumn is deterministic and in range") {
    val df = t.customer.select(
      Skew.saltColumn(5, col("c_custkey")).as("s1"),
      Skew.saltColumn(5, col("c_custkey")).as("s2"))
    assert(df.filter(col("s1") =!= col("s2")).count() == 0)
    assert(df.filter(col("s1") < 0 || col("s1") >= 5).count() == 0)
  }

  test("dupClusters labels transitive chains with the smallest member") {
    import spark.implicits._
    // chain 5-3-9, pair (2,8), singleton edge (7,7)? no: (1,4) separate
    val pairs = Seq((5L, 3L), (9L, 5L), (2L, 8L), (1L, 4L))
      .toDF("a", "b")
    val got = Dedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L,
      2L -> 2L, 8L -> 2L, 1L -> 1L, 4L -> 1L))
  }

  test("LSH bucket cap drops only oversized-bucket pairs") {
    val docs = t.documents
    val all = Dedup.minhashLshPairs(docs, "doc_id", "text")
    val capped = Dedup.minhashLshPairs(docs, "doc_id", "text",
      maxBucketSize = Some(2))
    // capped output is a subset of the uncapped pairs
    assert(capped.exceptAll(all).isEmpty)
    // an absurdly large cap changes nothing
    val loose = Dedup.minhashLshPairs(docs, "doc_id", "text",
      maxBucketSize = Some(1000000))
    assert(loose.exceptAll(all).isEmpty && all.exceptAll(loose).isEmpty)
  }
}
