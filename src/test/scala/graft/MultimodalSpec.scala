package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.gtfs.KmlExport

/** Multimodal plumbing + KML sink specs. */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def blobs = Seq(("a", "hello"), ("b", ""), ("c", "world picture bytes"))
    .toDF("id", "s").select(col("id"), encode(col("s"), "utf-8").as("blob"))

  test("decodeMeta appends a deterministic metadata struct, null-safe") {
    val withNull = blobs.unionByName(
      Seq("d").toDF("id").select(col("id"), lit(null).cast("binary").as("blob")))
    val out = Multimodal.decodeMeta(withNull, "blob")
    assert(out.schema.fieldNames.contains("media_meta"))
    val rows = out.select("id", "media_meta.byte_len", "media_meta.format")
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(rows("a")._1.contains(5))
    assert(rows("d") == ((None, None)))
    // deterministic: run twice, same formats
    val again = Multimodal.decodeMeta(withNull, "blob")
      .select("id", "media_meta.format").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    rows.foreach { case (k, (_, f)) => assert(again(k) == f.orNull) }
  }

  test("decodeMeta preserves partitioning (no repartition/shuffle)") {
    val df = blobs.repartition(3)
    assert(Multimodal.decodeMeta(df, "blob").rdd.getNumPartitions == 3)
  }

  test("resizeBinary bounds output size") {
    val out = Multimodal.resizeBinary(blobs.filter(col("id") =!= "b"), "blob", 8, 4)
    out.select("resized").collect().foreach { r =>
      assert(r.getAs[Array[Byte]](0).length == 32)
    }
  }

  test("sampleFrames keeps every k-th frame columnar") {
    val df = Seq(Seq("f0", "f1", "f2", "f3", "f4")).toDF("s")
      .select(transform(col("s"), f => encode(f, "utf-8")).as("frames"))
    val n = df.select(size(Multimodal.sampleFrames("frames", 2)).as("n"))
      .as[Int].head()
    assert(n == 3) // indexes 0, 2, 4
  }

  test("frame-overlap pairing: sampled-frame identity, short tails, band") {
    import spark.implicits._
    // 16-char blocks as frames; sampled = 1st, 3rd, 5th…
    def blk(c: Char) = c.toString * 16
    val docs = Seq(
      // a and b share ALL THREE sampled frames (A, C, E) with different
      // unsampled frames in between — the near-dup video pair
      (1L, blk('a') + blk('x') + blk('c') + blk('y') + blk('e')),
      (2L, blk('a') + blk('z') + blk('c') + blk('w') + blk('e')),
      // shares only A and C (2 < minShared 3)
      (3L, blk('a') + blk('q') + blk('c')),
      // 20-char blob: frames = [16-char, 4-char tail]; both sampled?
      // no — tail is frame 2 (unsampled); no overlap with anyone
      (4L, blk('k') + "tail")
    ).toDF("doc_id", "text")
    val vids = docs
      .select(col("doc_id"), encode(col("text"), "utf-8").as("blob"))
      .select(col("doc_id"), expr(
        "transform(sequence(1, cast(ceil(octet_length(blob) / 16.0) AS int)), " +
          "i -> substring(blob, (i - 1) * 16 + 1, 16))").as("frames"))
    val fh = vids
      .select(col("doc_id"),
        explode(Multimodal.sampleFrames("frames", 2)).as("f"))
      .select(col("doc_id"), md5(lower(hex(col("f")))).as("fp"))
      .distinct()
    val got = graft.operators.Dedup
      .sharedFingerprintPairs(fh, "doc_id", "fp", minShared = 3L, maxDf = 50L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 3L)))
  }

  test("phash64: locality, serial parity, hamming64Pairs recovers families") {
    import spark.implicits._
    // serial reference of the sampled-parity hash
    def serial(s: String): Long = {
      val b = s.getBytes("UTF-8"); val n = b.length
      (0 until 64).map { i =>
        if ((b((n.toLong * i / 64).toInt) & 0xf) % 2 == 1) 1L << (63 - i)
        else 0L
      }.foldLeft(0L)(_ | _)
    }
    val base = "0123456789abcdef" * 16 // 256 chars
    val oneOff = base.updated(4, 'e')  // byte 4 = sample i=1; parity flips
    val rows = Seq(base, oneOff, "zz", base.reverse)
    val got = rows.toDF("s")
      .select(Multimodal.phash64(encode(col("s"), "utf-8")))
      .as[Long].collect()
    assert(got.toSeq == rows.map(serial))
    // locality: one changed byte flips at most one sampled bit
    assert(java.lang.Long.bitCount(got(0) ^ got(1)) <= 1)
    // generic banding recovers planted families end-to-end (every pair
    // is within hamming <= 2 by construction — the m04 shape)
    val fams = (0L until 24L).map { id =>
      val fb = (0 until 8).map { k =>
        val md = java.security.MessageDigest.getInstance("MD5")
        md.digest(s"${id / 8}:$k".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      }.mkString
      val pos = ((id % 8) * 32).toInt
      id -> (fb.substring(0, pos) + "5" + fb.substring(pos + 1))
    }
    val ph = fams.toDF("doc_id", "s")
      .select(col("doc_id"),
        Multimodal.phash64(encode(col("s"), "utf-8")).as("p"))
    val pairs = graft.operators.Dedup
      .hamming64Pairs(ph, "doc_id", "p", maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    val want = for (f <- 0L until 3L; a <- 0L until 8L; b <- a + 1 until 8L)
      yield (f * 8 + a, f * 8 + b)
    assert(pairs.map(p => (p._1, p._2)).toSet == want.toSet)
    assert(pairs.forall(_._3 <= 2))
  }

  test("crossModal64Pairs: image bands generate, caption hamming " +
    "confirms, first-match bands stay disjoint") {
    import spark.implicits._
    // two image families (identical cand hashes within a family), one
    // member re-captioned: its pairs must die on the confirm filter
    val rows = Seq(
      (1L, 0x1111222233334444L, 100L), // family A, caption c1
      (2L, 0x1111222233334444L, 100L), // family A, caption c1
      (3L, 0x1111222233334444L, -1L),  // family A, alien caption
      (4L, 0x5555666677778888L, 200L), // family B, caption c2
      (5L, 0x5555666677778889L, 201L)  // family B, 1 img + 1 txt bit off
    ).toDF("id", "img", "txt")
    val got = graft.operators.Dedup
      .crossModal64Pairs(rows, "id", "img", "txt",
        maxHamCand = 3, maxHamConfirm = 8)
      .as[(Long, Long, Int, Int)].collect().toSet
    // (1,2): img 0, txt 0. (1,3)/(2,3): img 0 but txt hamming huge ->
    // dropped. (4,5): img 1, txt 1. Identical cand hashes collide on
    // ALL four bands — first-match disambiguation must emit the pair
    // exactly once (the Set size check would hide duplicates; count
    // the raw rows too).
    assert(got == Set((1L, 2L, 0, 0), (4L, 5L, 1, 1)))
    val raw = graft.operators.Dedup
      .crossModal64Pairs(rows, "id", "img", "txt",
        maxHamCand = 3, maxHamConfirm = 8).count()
    assert(raw == 2L)
  }

  test("audioFp64: serial parity, gain invariance, glitch locality") {
    import spark.implicits._
    def serial(codes: Seq[Int]): Long = {
      val en = (0 to 64).map(i => codes.slice(i * 4, i * 4 + 8).sum)
      (0 until 64).map(i => if (en(i) > en(i + 1)) 1L << (63 - i) else 0L)
        .foldLeft(0L)(_ | _)
    }
    val rnd = new scala.util.Random(42)
    val tracks = (0 until 20).map(_ => Seq.fill(280)(rnd.nextInt(200)))
    val variants = tracks.flatMap { t =>
      val g = t.map(_ + 9)                    // pure gain
      val glitched = t.updated(100, 999)      // one-sample pop
      Seq(t, g, glitched)
    }
    val got = variants.toDF("codes")
      .select(Multimodal.audioFp64(col("codes"))).as[Long].collect()
    assert(got.toSeq == variants.map(serial), "serial parity")
    got.grouped(3).zip(tracks.iterator).foreach { case (fps, _) =>
      assert(fps(0) == fps(1), "gain must drop out entirely")
      // one sample sits in ≤2 windows → ≤3 delta bits can flip
      assert(java.lang.Long.bitCount(fps(0) ^ fps(2)) <= 3, "glitch locality")
    }
  }

  test("kmlColor reorders to aabbggrr with 3-digit expansion") {
    val rows = Seq("#2D398B", "#abc", "oops").toDF("c")
      .select(KmlExport.kmlColor(col("c"))).as[String].collect()
    assert(rows(0) == "ff8B392D") // reference preserves the config's case
    assert(rows(1) == "ffccbbaa")
    assert(rows(2) == "ff000000")
  }

  test("kmlDocs renders one styled document per route") {
    val routes = Seq(("r1", "01A: Abdul Muis → Cicaheum", "#2D398B"))
      .toDF("relation_id", "route_name", "color")
    val ways = Seq(("r1", 0, Seq(Seq(107.6, -6.9), Seq(107.61, -6.91))))
      .toDF("relation_id", "feature_idx", "coords")
    val stops = Seq(("r1", 0, "Stop A", 107.6, -6.9))
      .toDF("relation_id", "feature_idx", "stop_name", "lon", "lat")
    val doc = KmlExport.kmlDocs(routes, ways, stops).collect()(0)
    assert(doc.getAs[String]("filename") == "01A_ Abdul Muis _ Cicaheum.kml")
    val kml = doc.getAs[String]("kml")
    assert(kml.contains("<color>ff8B392D</color>"))
    assert(kml.contains("107.6,-6.9 107.61,-6.91"))
    assert(kml.contains("<name>Stop A</name>"))
    assert(kml.contains("route-name"))
  }
}
