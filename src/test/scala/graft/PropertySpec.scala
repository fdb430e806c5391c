package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{geo, text, timecodec}
import graft.operators.{Sessionize, Skew}

/** Property-based invariants (SURVEY §5): ScalaCheck generates the data,
  * one Spark pass per property checks every sample column-wise — a
  * violation count of zero, not per-sample jobs.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    Iterator.from(0).map(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
      .flatten.take(n).toSeq

  private val anyString: Gen[String] = Gen.frequency(
    6 -> Gen.asciiPrintableStr,
    3 -> Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '),
      Gen.oneOf('é', '東', '!', '\t', '\n'))).map(_.mkString),
    1 -> Gen.const(""))

  test("normText is idempotent and emits only [a-z0-9] with single spaces") {
    val df = samples(anyString, 500).toDF("t")
      .select(text.normText(col("t")).as("n"))
      .withColumn("n2", text.normText(col("n")))
    val bad = df.filter(col("n") =!= col("n2") ||
      col("n").rlike("[^a-z0-9 ]") || col("n").rlike("  ") ||
      col("n").rlike("^ | $")).count()
    assert(bad == 0)
  }

  test("chunkTokens reconstructs the token stream; overlap is exact") {
    import graft.operators.Chunking
    // random word-ish docs over a tiny alphabet (forces repeated tokens)
    val doc: Gen[String] = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "bb", "ccc", "d1", "e")).map(_.mkString(" ")))
    val docs = samples(doc, 300).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val chunks = Chunking.chunkTokens(docs, "doc_id", "text",
        chunkSize = 7, overlap = 3)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Int, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val toks = docs.select(col("doc_id"), text.normText(col("text")).as("n"))
      .as[(Long, String)].collect().toMap
      .map { case (id, n) => id -> (if (n.isEmpty) Array.empty[String]
                                    else n.split(" ")) }
    toks.foreach { case (id, ts) =>
      val cs = chunks.getOrElse(id, Array.empty)
      if (ts.isEmpty) assert(cs.isEmpty, s"doc $id: chunks for empty doc")
      else {
        // stitching rule: chunk 0 whole, then drop each later chunk's
        // 3-token overlap — the concatenation must be the exact stream
        val stitched = cs.head._4.split(" ") ++
          cs.tail.flatMap(_._4.split(" ").drop(3))
        assert(stitched.toSeq == ts.toSeq, s"doc $id reconstruction")
        // every chunk except the last is exactly chunkSize tokens
        assert(cs.init.forall(_._3 == 7L), s"doc $id interior chunk size")
        assert(cs.last._3 == cs.last._4.split(" ").length.toLong)
      }
    }
  }

  test("time codec round-trips every non-negative second count") {
    val df = samples(Gen.chooseNum(0, 200 * 3600), 2000).toDF("s")
      .select(col("s"), timecodec.timeToSec(timecodec.secToTime(col("s"))).as("rt"))
    assert(df.filter(col("s") =!= col("rt")).count() == 0)
  }

  test("haversine is symmetric, non-negative, zero at identity") {
    val coord = for {
      lon1 <- Gen.chooseNum(-180.0, 180.0); lat1 <- Gen.chooseNum(-85.0, 85.0)
      lon2 <- Gen.chooseNum(-180.0, 180.0); lat2 <- Gen.chooseNum(-85.0, 85.0)
    } yield (lon1, lat1, lon2, lat2)
    val df = samples(coord, 500).toDF("lon1", "lat1", "lon2", "lat2")
      .select(
        geo.haversineKm(col("lon1"), col("lat1"), col("lon2"), col("lat2")).as("d"),
        geo.haversineKm(col("lon2"), col("lat2"), col("lon1"), col("lat1")).as("dr"),
        geo.haversineKm(col("lon1"), col("lat1"), col("lon1"), col("lat1")).as("dz"))
    val bad = df.filter(col("d") < 0 || col("dz") =!= 0.0 ||
      abs(col("d") - col("dr")) > 1e-9).count()
    assert(bad == 0)
  }

  test("cumulative track distance is non-decreasing within every group") {
    val pt = for {
      g <- Gen.chooseNum(1, 40); lon <- Gen.chooseNum(-180.0, 180.0)
      lat <- Gen.chooseNum(-85.0, 85.0)
    } yield (g, lon, lat)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("rid"))
    val df = samples(pt, 2000).zipWithIndex
      .map { case ((g, lon, lat), i) => (g, i.toLong, lon, lat) }
      .toDF("g", "rid", "lon", "lat")
      .withColumn("seg", coalesce(round(geo.haversineKm(
        lag(col("lon"), 1).over(w), lag(col("lat"), 1).over(w),
        col("lon"), col("lat")) * 1e6), lit(0.0)).cast("bigint"))
      .withColumn("cum", sum(col("seg")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("prev_cum", lag(col("cum"), 1).over(w))
    val bad = df.filter(col("prev_cum").isNotNull &&
      col("cum") < col("prev_cum")).count()
    assert(bad == 0)
  }

  test("min-spacing sweep keeps first per key and enforces the gap") {
    val ev = for {
      k <- Gen.chooseNum(1, 20); ts <- Gen.chooseNum(0L, 10000L)
    } yield (k.toLong, ts)
    val df = samples(ev, 2000).zipWithIndex
      .map { case ((k, ts), i) => (k, ts, i.toLong) }
      .toDF("k", "ts", "id")
    val kept = Sessionize.minSpacingSweep(df, "k", "ts", "id", minGapMs = 100)
    // every consecutive kept pair within a key is >= gap apart
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("ts"), col("id"))
    val gapBad = kept.withColumn("prev", lag(col("ts"), 1).over(w))
      .filter(col("prev").isNotNull && col("ts") - col("prev") < 100).count()
    assert(gapBad == 0)
    // the first event of every key survives
    val firsts = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("k"), col("ts"), col("id"))
    assert(firsts.join(kept, Seq("k", "ts", "id"), "left_anti").count() == 0)
  }

  test("winnow fingerprints are a subset of all gram hashes") {
    val df = samples(anyString, 300).toDF("t")
      .select(text.normText(col("t")).as("n"))
      .filter(length(col("n")) >= 8)
      .select(col("n"),
        graft.plans.WinnowFingerprints.winnow(col("n"), 8, 4).as("sel"))
      .withColumn("grams", expr(
        "transform(sequence(1, length(n) - 7), i -> substring(n, i, 8))"))
      .withColumn("all_h", expr(
        "transform(grams, g -> cast(conv(substring(md5(g), 1, 8), 16, 10) as bigint))"))
      .withColumn("stray", size(array_except(col("sel"), col("all_h"))))
    assert(df.filter(col("stray") =!= 0).count() == 0)
  }

  test("salt column stays in range for any salt count") {
    for (salts <- Seq(1, 2, 7, 32)) {
      val df = samples(Gen.chooseNum(Long.MinValue, Long.MaxValue), 500).toDF("v")
        .select(Skew.saltColumn(salts, col("v")).as("s"))
      assert(df.filter(col("s") < 0 || col("s") >= salts).count() == 0)
    }
  }

  test("assignSplit is total, stable, and roughly respects the cut sizes") {
    import graft.operators.Splits
    val cuts = Seq("train" -> 90, "val" -> 5, "test" -> 5)
    val ids = samples(Gen.chooseNum(0L, Long.MaxValue), 2000).distinct
    val df = ids.toDF("id")
      .select(col("id"), Splits.assignSplit(col("id"), cuts).as("s1"),
        Splits.assignSplit(col("id"), cuts).as("s2"))
      .cache()
    // total + deterministic: every id gets the same named split twice
    assert(df.filter(col("s1").isNull || col("s1") =!= col("s2")).count() == 0)
    val counts = df.groupBy("s1").count().as[(String, Long)].collect().toMap
    val n = ids.size.toDouble
    // md5 buckets are uniform: 90/5/5 within generous slack
    assert(counts.keySet == Set("train", "val", "test"), counts.toString)
    assert(counts("train") / n > 0.8 && counts("train") / n < 0.97, counts.toString)
    df.unpersist()
  }

  test("asofJoin is left-preserving and never looks into the future") {
    import graft.operators.AsofJoin
    val rows = samples(Gen.zip(Gen.chooseNum(1L, 5L), Gen.chooseNum(0L, 1000L)), 400)
    val left = rows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      .toDF("k", "t", "lid")
    // right: one row per (k, t) as the operator contract requires
    val right = rows.distinct.zipWithIndex
      .collect { case ((k, t), i) if i % 3 == 0 => (k, t, t) }
      .toDF("k", "t", "rt")
    val out = AsofJoin.asofJoin(left, right, "k", "t").cache()
    assert(out.count() == left.count()) // every left row survives exactly once
    // the carried right timestamp never exceeds the left timestamp
    assert(out.filter(col("asof_rt").isNotNull && col("asof_rt") > col("t"))
      .count() == 0)
    out.unpersist()
  }

  test("weightedSampleNoReplacement: exact k from the population, " +
    "nested panels as k grows (A-Res keys are per-row constants)") {
    import graft.operators.Splits
    val rows = samples(Gen.chooseNum(1L, 5000L), 300).distinct
      .map(id => (id, 1L + id % 97))
    val df = rows.toDF("id", "w")
    val panels = Seq(10, 40, 80).map { k =>
      k -> Splits.weightedSampleNoReplacement(df, "id", "w", k, salt = 5)
        .select("id").as[Long].collect().toSet
    }
    panels.foreach { case (k, p) =>
      assert(p.size == k && p.subsetOf(rows.map(_._1).toSet))
    }
    // a larger draw EXTENDS a smaller one — the keys are fixed per row,
    // so top-10 ⊆ top-40 ⊆ top-80 (the resample-stability property that
    // makes panel growth cheap)
    assert(panels(0)._2.subsetOf(panels(1)._2) &&
      panels(1)._2.subsetOf(panels(2)._2))
  }

  test("PointInPolygon: membership is invariant under starting-vertex " +
    "rotation and winding reversal") {
    // a polygon is the same region whatever vertex the array starts at
    // and whichever way it winds — the crossing test must agree
    val verts = Seq((0L, 0L), (9L, 2L), (12L, 8L), (5L, 11L), (-2L, 6L))
    def df(vs: Seq[(Long, Long)]) = Seq((1L, vs)).toDF("id", "raw")
      .select(expr("transform(raw, r -> struct(r._1 AS x, r._2 AS y))")
        .as("verts"))
    val pts = (for (x <- -3L to 13L; y <- -1L to 12L) yield (x, y))
      .toDF("px", "py")
    def members(vs: Seq[(Long, Long)]): Set[(Long, Long)] =
      pts.crossJoin(df(vs))
        .filter(graft.plans.PointInPolygon
          .pointInPolygon(col("px"), col("py"), col("verts")))
        .select("px", "py").as[(Long, Long)].collect().toSet
    val base = members(verts)
    assert(base.nonEmpty)
    // rotation keeps every directed edge → exact equality incl. boundary
    for (r <- 1 until verts.size) {
      assert(members(verts.drop(r) ++ verts.take(r)) == base,
        s"rotation by $r changed membership")
    }
    // reversal flips edge directions: the half-open rule may legally
    // reassign points ON the boundary, so compare away from it
    def onEdge(p: (Long, Long)): Boolean =
      verts.indices.exists { i =>
        val (x1, y1) = verts(i); val (x2, y2) = verts((i + 1) % verts.size)
        val (px, py) = p
        (x2 - x1) * (py - y1) == (y2 - y1) * (px - x1) &&
          px >= math.min(x1, x2) && px <= math.max(x1, x2) &&
          py >= math.min(y1, y2) && py <= math.max(y1, y2)
      }
    val rev = members(verts.reverse)
    assert(rev.filterNot(onEdge) == base.filterNot(onEdge),
      "winding reversal changed interior membership")
  }

  test("q15 sketch bounds: approx_count_distinct within 3·rsd and " +
    "percentile_approx within its 1/accuracy rank guarantee vs exact") {
    // q15 is rows-only in CORRECTNESS by design (sketch internals are
    // engine-specific) — but the sketches' PUBLISHED error bounds are
    // assertable against the exact answers on the same data: HLL++ with
    // rsd = 0.02 (3σ relative error), ApproximatePercentile with
    // accuracy = 1000 (rank error ≤ N/1000, ±1 rank boundary slack).
    val dir = "/root/testdata/sf0.01"
    val approx = SparkEntry.queries("q15_approx_stats")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val li = Tables(spark, dir).lineitem
    val exactDistinct = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val prices = li.select(col("l_returnflag"),
        col("l_extendedprice").cast("double"))
      .as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((flag, (aParts, p50, p99)) <- approx) {
      val ex = exactDistinct(flag)
      assert(math.abs(aParts - ex) <= math.max(3 * 0.02 * ex, 1.0),
        s"$flag: approx distinct $aParts vs exact $ex beyond 3·rsd")
      val vs = prices(flag)
      val n = vs.length
      val eps = n / 1000.0
      def rankOk(v: Double, p: Double): Unit = {
        val lo = vs.count(_ < v) + 1 // smallest rank v could hold
        val hi = vs.count(_ <= v)    // largest rank v could hold
        val lb = p * n - eps - 1
        val ub = p * n + eps + 1
        assert(hi >= lb && lo <= ub,
          s"$flag p$p: value $v holds ranks [$lo,$hi], " +
            s"outside [$lb,$ub] of n=$n")
      }
      rankOk(p50, 0.5)
      rankOk(p99, 0.99)
    }
  }

  test("containment dominates jaccard: every jaccard pair at θ appears " +
    "in BOTH containment directions at the same θ, with C ≥ J") {
    // C(a→b) = |A∩B|/|A| ≥ |A∩B|/|A∪B| = J always — so d09's output at
    // a threshold must embed into d21's (both directions), and the
    // scores must dominate pairwise. Cross-operator consistency on the
    // real corpus, beyond each operator's own oracle.
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val theta = (3, 5)
    val jac = graft.operators.Dedup
      .prefixJaccardPairs(docs, "doc_id", "text",
        thetaNum = theta._1, thetaDen = theta._2, shingleN = 3)
      .as[(Long, Long, Double)].collect()
    assert(jac.nonEmpty, "fixture produced no jaccard pairs")
    val cont = graft.operators.Dedup
      .containmentPairs(docs, "doc_id", "text",
        thetaNum = theta._1, thetaDen = theta._2, shingleN = 3)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    for ((a, b, j) <- jac; (x, y) <- Seq((a, b), (b, a))) {
      val c = cont.get((x, y))
      assert(c.nonEmpty, s"jaccard pair ($a,$b) missing containment $x→$y")
      assert(c.get >= j - 1e-9, s"C($x→$y)=${c.get} < J=$j")
    }
  }
}
