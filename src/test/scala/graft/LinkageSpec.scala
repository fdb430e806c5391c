package graft

import graft.operators.Linkage
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(rows: Seq[(Long, String)], maxDist: Int)
      : Set[(Long, Long, Int)] =
    (for {
      (ia, ka) <- rows; (ib, kb) <- rows if ia < ib
      d = ka.zip(kb).count { case (x, y) => x != y }
      if d <= maxDist
    } yield (ia, ib, d)).toSet

  private def run(rows: Seq[(Long, String)], keyLen: Int, maxDist: Int,
                  maxBlock: Long = 1L << 16): Set[(Long, Long, Int)] =
    Linkage.hammingKeyPairs(rows.toDF("id", "key"), "id", "key",
        keyLen, maxDist, maxBlock)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("hand case: exact dup, 1-sub, 2-sub in different segments, 3-sub out") {
    val rows = Seq(1L -> "abcdefgh", 2L -> "abcdefgh", // dist 0
      3L -> "abcdefgX",                                // dist 1 to 1,2
      4L -> "aXcdefgX",                                // dist 2 to 1,2; 1 to 3
      5L -> "XXXdefgh")                                // dist 3 to 1,2
    val got = run(rows, keyLen = 8, maxDist = 2)
    assert(got == brute(rows, 2))
    // spot shapes: the exact dup, a cross-segment 2-sub, and the 3-sub out
    assert(got.contains((1L, 2L, 0)) && got.contains((1L, 4L, 2)))
    assert(!got.exists { case (a, b, _) => a == 5L || b == 5L })
  }

  test("pigeonhole completeness: equals brute force on random keys") {
    val rnd = new scala.util.Random(23)
    val alphabet = "abc" // small alphabet -> plenty of near pairs
    val rows = (1L to 120L).map(i =>
      i -> Seq.fill(9)(alphabet(rnd.nextInt(alphabet.length))).mkString)
    for (d <- 0 to 2)
      assert(run(rows, keyLen = 9, maxDist = d) == brute(rows, d),
        s"maxDist=$d mismatch")
  }

  test("wrong-length keys are excluded, not crashed on") {
    val rows = Seq(1L -> "abcdefgh", 2L -> "abcdefgh", 3L -> "short",
      4L -> "waytoolongforakey")
    assert(run(rows, keyLen = 8, maxDist = 1) == Set((1L, 2L, 0)))
  }

  test("each pair is emitted exactly once (multi-segment agreement " +
    "never duplicates rows)") {
    // the exact dup (1,2) agrees on ALL three segments; (1,3)/(2,3)
    // agree on two — every pair must still surface exactly once
    val rows = Seq(1L -> "abcdefgh", 2L -> "abcdefgh", 3L -> "abcdefgX")
    val df = Linkage.hammingKeyPairs(rows.toDF("id", "key"), "id", "key",
      keyLen = 8, maxDist = 2)
    val (n, nd) = (df.count(), df.distinct().count())
    assert(n == nd && n == 3, s"rows=$n distinct=$nd")
  }

  test("maxBlock: an over-dense segment stops blocking, and the " +
    "exclusion is the documented contract (pairs agreeing ONLY on that " +
    "segment drop; pairs sharing another segment survive)") {
    // segment bounds for keyLen=8, maxDist=2: (1,2)(3,5)(6,8).
    // All keys share seg0 "aa" (block of 3 > cap 2). Pair (1,3) agrees
    // ONLY on seg0; (1,2) still shares seg1 "aab"; (2,3) shares seg2
    // "bcX".
    val rows = Seq(1L -> "aaaabbcc", 2L -> "aaaabbcX", 3L -> "aaaaXbcX")
    val full = run(rows, keyLen = 8, maxDist = 2)
    assert(full == brute(rows, 2))
    assert(full.contains((1L, 3L, 2)))
    val capped = run(rows, keyLen = 8, maxDist = 2, maxBlock = 2L)
    assert(capped == full - ((1L, 3L, 2)))
  }
}
