package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.text

/** Document deduplication operators for large-scale training-data pipelines
  * (BASELINE.json north star): exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale posture (100 TB): everything is groupBy/join on content-derived
  * keys — fingerprints, band signatures, hash buckets — so work distributes
  * by shuffle on those keys and no driver-side state exists. Candidate
  * generation never compares all pairs: LSH bands / signature bytes bound
  * the comparison set to same-bucket collisions. The shingle arrays ride
  * along the candidate join here for simplicity; at extreme scale you'd
  * re-join the text by id after candidate generation instead (noted inline).
  */
object Dedup {

  /** Exact dedup by normalized-text md5 fingerprint: first-wins per group
    * (smallest id — deterministic, mirroring the reference's insertion-order
    * first-wins dedup, SURVEY §2.6 A2). Returns one row per distinct
    * fingerprint: (keeper id, n_copies).
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), text.fingerprint(col(textCol)).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  /** MinHash signature columns m1..mK over n-word shingles: mJ = min over
    * shingles of a salted 32-bit hash. Docs with fewer than `shingleN`
    * tokens are dropped (no signature exists).
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        k: Int, shingleN: Int): DataFrame = {
    val withSh = docs
      .withColumn("sh", text.shingles(col(textCol), shingleN))
      .filter(size(col("sh")) >= 1)
    val sigCols = (1 to k).map { j =>
      array_min(transform(col("sh"), s => text.saltedHash32(s, j))).as(s"m$j")
    }
    withSh.select(col(idCol) +: col("sh") +: sigCols: _*)
  }

  /** MinHash-LSH candidate pairs with exact n-gram-Jaccard verification:
    * signature of `k` hashes split into `bands` bands; a pair is a candidate
    * iff some band signature collides; candidates get exact Jaccard over
    * distinct shingles. Output: (a, b, jaccard), a < b.
    *
    * The band join is an equi-join on the band hash — a plain shuffle join
    * that scales; the quadratic blow-up is bounded per bucket.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      k: Int = 8, bands: Int = 2, shingleN: Int = 3): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    val sigs = minhashSignatures(docs, idCol, textCol, k, shingleN)
    val banded = (0 until bands).foldLeft(sigs) { (df, b) =>
      val cols = (b * r + 1 to (b + 1) * r).map(j => col(s"m$j"))
      df.withColumn(s"band$b", md5(concat_ws(",", cols: _*)))
    }
    val left = banded.select(Seq(col(idCol).as("a"), col("sh").as("sha")) ++
      (0 until bands).map(b => col(s"band$b")): _*)
    val right = banded.select(Seq(col(idCol).as("b"), col("sh").as("shb")) ++
      (0 until bands).map(b => col(s"band$b").as(s"rband$b")): _*)
    val cands = (0 until bands).map { b =>
      left.join(right, col(s"band$b") === col(s"rband$b") && col("a") < col("b"))
        .select(col("a"), col("b"), col("sha"), col("shb"))
    }.reduce(_ unionByName _).dropDuplicates("a", "b")
    cands
      .withColumn("da", array_distinct(col("sha")))
      .withColumn("db", array_distinct(col("shb")))
      .withColumn("inter", size(array_intersect(col("da"), col("db"))))
      .withColumn("uni", size(col("da")) + size(col("db")) - col("inter"))
      .select(col("a"), col("b"),
        round(col("inter").cast("double") / col("uni"), 4).as("jaccard"))
  }

  /** 16-bit SimHash per document: bit b is the majority vote of bit b over
    * the 16-bit md5-derived hashes of all (non-distinct) tokens.
    * Two aggregation levels, both map-side combinable.
    */
  def simhash16(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(text.tokens(col(textCol))).as("tok"))
      .withColumn("h", text.tokenHash16(col("tok")))
    val bitSums = (0 until 16).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1)) === 1, 1).otherwise(-1))
        .as(s"s$b")
    }
    val sums = toks.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 16)
      .map(b => when(col(s"s$b") > 0, lit(1 << b)).otherwise(lit(0)))
      .reduce[Column](_ + _)
    sums.select(col(idCol), sim.cast("int").as("simhash"))
  }

  /** Near-dup pairs by SimHash: bucket by each signature byte (a pair with
    * hamming distance ≤ maxHamming on 16 bits shares at least one byte when
    * maxHamming < 8·…; standard banding argument), then exact hamming
    * filter. Output (a, b, hamming).
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sim = simhash16(docs, idCol, textCol)
    val withBytes = sim
      .withColumn("hi", shiftright(col("simhash"), 8))
      .withColumn("lo", col("simhash").bitwiseAND(lit(0xff)))
    val l = withBytes.select(col(idCol).as("a"), col("simhash").as("simA"),
      col("hi"), col("lo"))
    val r = withBytes.select(col(idCol).as("b"), col("simhash").as("simB"),
      col("hi").as("rhi"), col("lo").as("rlo"))
    val cands = l.join(r, (col("hi") === col("rhi") || col("lo") === col("rlo"))
        && col("a") < col("b"))
      .dropDuplicates("a", "b")
    cands
      .withColumn("hamming", bit_count(col("simA").bitwiseXOR(col("simB"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming").cast("int").as("hamming"))
  }
}
