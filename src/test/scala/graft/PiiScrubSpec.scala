package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.text

/** Byte-equivalence of the fused PiiScrub kernel against the regex
  * `Column` forms it replaced (3× piiCount + the chained scrubPii) —
  * the t13 DuckDB oracle mirrors the regex forms, so any divergence
  * here would silently break the oracle gate while tests stay green.
  */
class PiiScrubSpec extends SparkTestBase {
  import spark.implicits._

  private def regexCols(c: org.apache.spark.sql.Column) = Seq(
    text.piiCount(c, text.EmailPattern).as("re"),
    text.piiCount(c, text.Ipv4Pattern).as("ri"),
    text.piiCount(c, text.PhonePattern).as("rp"),
    text.scrubPii(c).as("rs"))

  private def kernelCols(c: org.apache.spark.sql.Column) = {
    val r = text.piiScrubReport(c)
    Seq(r.getField("n_emails").as("ke"), r.getField("n_ips").as("ki"),
      r.getField("n_phones").as("kp"), r.getField("scrubbed").as("ks"))
  }

  private def assertParity(inputs: Seq[String]): Unit = {
    val rows = inputs.toDF("t")
      .select(col("t") +: (regexCols(col("t")) ++ kernelCols(col("t"))): _*)
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(5), s"emails: $r")
      assert(r.getInt(2) == r.getInt(6), s"ips: $r")
      assert(r.getInt(3) == r.getInt(7), s"phones: $r")
      assert(r.getString(4) == r.getString(8), s"scrub: $r")
    }
  }

  test("kernel == regex forms on targeted adversarial inputs") {
    assertParity(Seq(
      "",
      " ",
      "no pii here at all",
      // the three classes interleaved, with multiplicity
      "mail a@b.org then 1.2.3.4 or c.d@e-f.co and 555-123-4567 end",
      // email local part absorbs ._%+- ; domain backtracks to last dot
      "..a%b+c_d-e@sub.ex-1.org..",
      "x@y.org.z2 keeps the trailing run",
      "a@1.2.3.4.com domain-embedded IP is eaten by the email",
      // failed domain must rescan after the '@' (second email inside)
      "a@b.c@d.org",
      "a@@b.org",
      "no-tld a@b or a@b.c single-letter",
      // email replacement CREATES a \b the original lacked: chained
      // phone fires, original-count stays 0 — the case where counts
      // and scrub legitimately diverge
      "x@y.org555-867-5309",
      "x@y.org10.0.0.1",
      // \b refusals
      "v1.2.3.4x and 1234.5.6.7.8 and a555-867-5309",
      "1.2.3.4567 and 12.34.56 and 1.2.3.45a",
      "555-12-4567 and 555-123-45678 and 5551-867-1234",
      // boundary at string edges
      "1.2.3.4",
      "555-867-5309",
      "a@b.de",
      // adjacent matches and punctuation boundaries
      "1.2.3.4.5.6.7.8 chains",
      "(10.0.0.1),555-867-5309;e@f.org!",
      // unicode neighbours (continuation bytes are non-word)
      "é1.2.3.4é and 東555-867-5309東 and ü@x.orgü",
      "café a@b.org 東京 10.1.2.3 тест",
      // digits glued via underscore (word char, kills \b)
      "_1.2.3.4_ and _555-867-5309_",
      // long digit runs backtracking
      "999.999.999.999 and 9999.999.999.999 and 999.9999.999.999"
    ))
  }

  test("kernel == regex forms on malformed UTF-8 neighbours") {
    // Malformed bytes can't ride a Scala String (UTF-16), but a
    // binary→string CAST wraps raw bytes into a UTF8String unvalidated —
    // exactly how a dirty crawl row reaches the scrubber. The regex
    // forms decode-with-replacement (U+FFFD, non-word) and re-encode;
    // the kernel must match both the \b outcomes AND the sanitized
    // output bytes. The overlong cases would decode to WORD chars
    // ('a', '/') under a lenient decoder — the divergence pinned here.
    def m(lead: Int*)(tail: String): Array[Byte] =
      lead.map(_.toByte).toArray ++ tail.getBytes("UTF-8")
    def t(head: String)(trail: Int*): Array[Byte] =
      head.getBytes("UTF-8") ++ trail.map(_.toByte).toArray
    val cases: Seq[Array[Byte]] = Seq(
      m(0xC1, 0xA1)("1.2.3.4"),             // overlong 'a' before an IP
      t("555-867-5309")(0xC1, 0xA1),        // overlong 'a' after a phone
      m(0xC0, 0xAF)("a@b.org"),             // overlong '/'
      t("contact a@b.org")(0xC1, 0xB1),     // overlong 'q' after an email
      m(0xED, 0xA0, 0x80)("1.2.3.4"),       // CESU-8 surrogate
      m(0xF0, 0x8F, 0xBF, 0xBF)("10.0.0.1"), // overlong 4-byte
      m(0xE9)("1.2.3.4"),                   // truncated lead (é cut short)
      t("1.2.3.4")(0x80),                   // bare continuation byte
      m(0xF4, 0x90, 0x80, 0x80)("555-867-5309"), // beyond U+10FFFF
      t("x@y.org")(0xC2))                   // truncated 2-byte at EOS
    // compare scrubbed outputs as RAW BYTES (string→binary cast is a
    // passthrough): a row-read String compare would itself decode with
    // replacement and mask an unsanitized kernel output
    val rows = cases.toDF("b")
      .select(col("b").cast("string").as("t"))
      .select(col("t") +: (regexCols(col("t")) ++ kernelCols(col("t"))): _*)
      .withColumn("rsb", col("rs").cast("binary"))
      .withColumn("ksb", col("ks").cast("binary"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(5), s"emails: $r")
      assert(r.getInt(2) == r.getInt(6), s"ips: $r")
      assert(r.getInt(3) == r.getInt(7), s"phones: $r")
      assert(java.util.Arrays.equals(
        r.getAs[Array[Byte]]("rsb"), r.getAs[Array[Byte]]("ksb")),
        s"scrub bytes: $r")
    }
  }

  test("kernel == regex forms on 600 random pii-soup samples") {
    val atom: Gen[String] = Gen.frequency(
      4 -> Gen.oneOf("a@b.org", "u5@ex3.org", "x@y.o", "a@b", "@", "a@",
        "%+-@..", "a@b.c-d.ef", "a@b..org"),
      4 -> Gen.oneOf("1.2.3.4", "10.0.0.255", "1.2.3", "1.2.3.4.5",
        "1234.5.6.7", "1.2.3.4567", "255.255.255.255", "0.0.0.0"),
      4 -> Gen.oneOf("555-867-5309", "555-12-4567", "5551-867-1234",
        "555-123-45678", "123-456-7890"),
      5 -> Gen.oneOf("word", "w0rd", "_", ".", "-", "..", "a", "5", "東", "é",
        " ", "  ", "", "!", "(", ")", ",", "@", "%", "+"))
    val doc: Gen[String] = Gen.chooseNum(0, 12)
      .flatMap(n => Gen.listOfN(n, atom))
      .flatMap(parts => Gen.oneOf("", " ", "x", "5")
        .map(sep => parts.mkString(sep)))
    val inputs = Iterator.from(0)
      .map(i => doc.apply(Gen.Parameters.default, Seed(i.toLong)))
      .flatten.take(600).toSeq
    assertParity(inputs)
  }

  test("kernel == regex forms on the enriched sf0.001 documents table") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
    val id = col("doc_id")
    // the t13 enrichment arithmetic
    val etext = concat(col("text"),
      when(pmod(id, lit(3)) =!= 0,
        concat(lit(" contact u"), id, lit("@ex"), pmod(id, lit(7)),
          lit(".org"))).otherwise(lit("")),
      when(pmod(id, lit(4)) =!= 0,
        concat(lit(" from 10."), pmod(id, lit(256)), lit(".0."),
          pmod(id, lit(100)))).otherwise(lit("")),
      when(pmod(id, lit(5)) =!= 0,
        concat(lit(" tel 555-867-"),
          lpad(pmod(id, lit(10000)).cast("string"), 4, "0")))
        .otherwise(lit(""))).as("t")
    val n = docs.select(etext)
      .select(col("t") +: (regexCols(col("t")) ++ kernelCols(col("t"))): _*)
      .filter(col("re") =!= col("ke") || col("ri") =!= col("ki") ||
        col("rp") =!= col("kp") || col("rs") =!= col("ks"))
      .count()
    assert(n == 0, s"$n rows diverge")
  }
}
