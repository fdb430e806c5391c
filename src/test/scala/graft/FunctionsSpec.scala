package graft

import org.apache.spark.sql.functions._
import graft.functions.{geo, timecodec, text, vectors}

/** Kernel-level unit tests (SURVEY.md §5 unit plan): haversine against
  * known pairs, time codec at >24h, shingle/tokenizer edges, cosine.
  */
class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("haversine matches known distance (Bandung→Jakarta ~116 km)") {
    val d = Seq((107.6098, -6.9147, 106.8456, -6.2088))
      .toDF("lon1", "lat1", "lon2", "lat2")
      .select(geo.haversineKm(col("lon1"), col("lat1"), col("lon2"), col("lat2")))
      .as[Double].head()
    assert(math.abs(d - 116.0) < 2.0, s"got $d")
    val dm = Seq((107.6098, -6.9147, 106.8456, -6.2088))
      .toDF("lon1", "lat1", "lon2", "lat2")
      .select(geo.haversineM(col("lon1"), col("lat1"), col("lon2"), col("lat2")))
      .as[Double].head()
    assert(math.abs(dm / 1000 - d) < 1e-9)
  }

  test("haversine of identical points is 0") {
    val d = Seq((107.6, -6.9)).toDF("lon", "lat")
      .select(geo.haversineKm(col("lon"), col("lat"), col("lon"), col("lat")))
      .as[Double].head()
    assert(d == 0.0)
  }

  test("time codec handles >24h (GTFS 25:10 stays 25h)") {
    val rows = Seq("25:10", "04:00", "23:59:30", "not a time", "9:05")
      .toDF("t")
      .select(col("t"), timecodec.timeToSec(col("t")).as("s"))
      .withColumn("rt", timecodec.secToTime(col("s")))
      .collect()
    val bySrc = rows.map(r => r.getString(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(bySrc("25:10") == ((25 * 3600 + 600, "25:10:00")))
    assert(bySrc("04:00") == ((4 * 3600, "04:00:00")))
    assert(bySrc("23:59:30") == ((23 * 3600 + 59 * 60 + 30, "23:59:30")))
    assert(bySrc("not a time")._1 == 0)
    assert(bySrc("9:05")._1 == 9 * 3600 + 300)
  }

  test("secToTime rounds to nearest second") {
    val s = Seq(59.6).toDF("s").select(timecodec.secToTime(col("s")))
      .as[String].head()
    assert(s == "00:01:00")
  }

  test("tokenizer and shingles edges") {
    val df = Seq(
      ("a b c d", 4, 2),   // 2 tri-shingles
      ("a b", 2, 0),       // too short for 3-shingles
      ("  Hi, there!! ", 2, 0),
      ("", 0, 0)
    ).toDF("text", "wantTok", "wantSh")
    val got = df.select(col("wantTok"), col("wantSh"),
      text.tokenCount(col("text")).as("tok"),
      size(text.shingles(col("text"), 3)).as("sh")).collect()
    got.foreach { r =>
      assert(r.getInt(2) == r.getInt(0), s"tokens: $r")
      assert(r.getInt(3) == r.getInt(1), s"shingles: $r")
    }
  }

  test("scrubPii: all three classes, multiplicity, clean-text identity") {
    val rows = Seq(
      // two emails, one IP, one phone, interleaved
      ("mail a@b.org then 1.2.3.4 or c.d@e-f.co and 555-123-4567 end",
        2, 1, 1,
        "mail <EMAIL> then <IP> or <EMAIL> and <PHONE> end"),
      // IP digits glued to a word: \b refuses the partial match
      ("v1.2.3.4x stays but 10.0.0.1 goes", 0, 1, 0,
        "v1.2.3.4x stays but <IP> goes"),
      // phone needs the full 3-3-4 shape
      ("555-12-4567 and 555-123-45678 survive", 0, 0, 0,
        "555-12-4567 and 555-123-45678 survive"),
      // clean text is untouched
      ("no pii here at all", 0, 0, 0, "no pii here at all")
    ).toDF("t", "we", "wi", "wp", "want")
    rows.select(col("we"), col("wi"), col("wp"), col("want"),
        text.piiCount(col("t"), text.EmailPattern).as("e"),
        text.piiCount(col("t"), text.Ipv4Pattern).as("i"),
        text.piiCount(col("t"), text.PhonePattern).as("p"),
        text.scrubPii(col("t")).as("got"))
      .collect().foreach { r =>
        assert(r.getInt(4) == r.getInt(0), s"emails: $r")
        assert(r.getInt(5) == r.getInt(1), s"ips: $r")
        assert(r.getInt(6) == r.getInt(2), s"phones: $r")
        assert(r.getString(7) == r.getString(3), s"scrub: $r")
      }
  }

  test("shingles are space-joined consecutive words") {
    val sh = Seq("w1 w2 w3 w4").toDF("text")
      .select(text.shingles(col("text"), 3)).as[Seq[String]].head()
    assert(sh == Seq("w1 w2 w3", "w2 w3 w4"))
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f), 1.0),
      (Seq(1.0f, 0.0f), Seq(0.0f, 3.0f), 0.0)).toDF("a", "b", "want")
    df.select(vectors.cosine(vectors.asDouble(col("a")),
        vectors.asDouble(col("b"))).as("c"), col("want"))
      .collect().foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("cosine of mismatched-length vectors is null (HOF parity)") {
    val r = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0)))
      .toDF("a", "b")
      .select(vectors.cosine(col("a"), col("b")).as("c"))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("hashedLinearScore: distinct-token sum, empty doc, serial parity") {
    val w = graft.queries.TextQ.QualityWeights
    def serial(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ")
        .trim.split(" ").filter(_.nonEmpty).distinct.map { t =>
          val hex = md.digest(t.getBytes("UTF-8"))
            .take(2).map("%02x".format(_)).mkString
          w(Integer.parseInt(hex, 16) % w.size).toLong
        }.sum
    }
    // distinctness: "spam spam spam" scores once, not thrice
    val rows = Seq("spam spam spam", "spam", "", "  !!  ",
      "The quick brown fox JUMPS, 42 times.")
    val got = rows.toDF("text")
      .select(text.hashedLinearScore(col("text"), w)).as[Long].collect()
    assert(got.toSeq == rows.map(serial))
    assert(got(0) == got(1) && got(2) == 0L && got(3) == 0L)
    // serial parity over the real corpus
    val corpus = Tables(spark, sfSmoke).documents
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val real = Tables(spark, sfSmoke).documents
      .select(col("doc_id"), text.hashedLinearScore(col("text"), w))
      .as[(Long, Long)].collect().toMap
    corpus.foreach { case (id, t) => assert(real(id) == serial(t)) }
  }

  test("lerp endpoints and midpoint") {
    val r = Seq((0.0, 10.0)).toDF("a", "b")
      .select(geo.lerp(col("a"), col("b"), lit(0.0)),
        geo.lerp(col("a"), col("b"), lit(0.5)),
        geo.lerp(col("a"), col("b"), lit(1.0))).head()
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 5.0 && r.getDouble(2) == 10.0)
  }
}
