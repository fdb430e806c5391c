package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage by FUZZY-KEY pair join: all id pairs whose fixed-length
  * keys lie within a Hamming-distance bound — the entity-resolution
  * primitive (dirty identifiers, OCR'd codes, boilerplate-prefixed
  * documents) the similarity family doesn't cover: d02/d09 match SETS of
  * shingles, this matches POSITIONS of a structured key.
  *
  * Blocking is the PIGEONHOLE partition scheme (the exact-filter core of
  * PassJoin, Li et al. 2011, specialized to the substitution metric):
  * split every key into `maxDist + 1` contiguous segments — at most
  * `maxDist` substitutions cannot touch them all, so any qualifying pair
  * agrees EXACTLY on at least one aligned segment. Candidates are
  * therefore the union of per-segment equi-self-joins — a banded join
  * like MinHash LSH's (d02), but LOSSLESS: the filter is a theorem, not
  * a probability, so the result is exact and oracle-able.
  *
  * Scale shape: one explode to (maxDist+1)× rows, one equi-join per the
  * composite (segment index, segment text) key — never all-pairs; the
  * verify is a codegen'd per-row character comparison, run BEFORE the
  * dedup so only the match-sized set shuffles on the pair key.
  * `maxBlock` is the d21-class density guard: a segment
  * value shared by B keys contributes B² candidates, so pathological
  * blocks (a constant key region — the 100 TB boilerplate case) are
  * excluded from BLOCKING, by both engine and oracle (semantics, not a
  * silent recall loss: pairs agreeing only on an over-dense segment are
  * out of the result's contract, exactly like d21's maxDf).
  */
object Linkage {

  /** (a, b, dist): id pairs (a < b) with Hamming(key_a, key_b) <=
    * maxDist. Keys MUST be exactly `keyLen` chars (enforced by filter;
    * shorter/longer rows are excluded — pad or truncate upstream), and
    * ids must be UNIQUE: the a < b canonicalization silently drops a
    * pair whose two rows share an id (dedupe upstream if ids can
    * repeat with different keys).
    */
  def hammingKeyPairs(df: DataFrame, idCol: String, keyCol: String,
                      keyLen: Int, maxDist: Int,
                      maxBlock: Long = 1L << 16): DataFrame = {
    require(keyLen >= maxDist + 1, "keys shorter than maxDist+1 segments")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val keyed = df.select(col(idCol).as("id"), col(keyCol).as("key"))
      .filter(length(col("key")) === keyLen)
    // maxDist+1 equal-ish contiguous segments: bounds are the canonical
    // integer split, identical in the SQL mirror
    val nSeg = maxDist + 1
    val bounds = (0 to nSeg).map(i => i * keyLen / nSeg)
    val segCols = (0 until nSeg).map { i =>
      struct(lit(i).as("seg"),
        substring(col("key"), bounds(i) + 1, bounds(i + 1) - bounds(i))
          .as("blk"))
    }
    val tagged = keyed.select(col("id"), col("key"),
        explode(array(segCols: _*)).as("sb"))
      .select(col("id"), col("key"), col("sb.seg").as("seg"),
        col("sb.blk").as("blk"))
    // density guard: blocks over maxBlock are excluded from blocking
    // (they would contribute B² candidates); the exclusion is part of
    // the operator's contract and mirrored by the oracle
    val okBlocks = tagged.groupBy(col("seg"), col("blk"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBlock)
      .select(col("seg"), col("blk"))
    val t = tagged.join(okBlocks, Seq("seg", "blk"))
    val cand = t.select(col("seg"), col("blk"), col("id").as("a"),
        col("key").as("ka"))
      .join(t.select(col("seg"), col("blk"), col("id").as("b"),
        col("key").as("kb")), Seq("seg", "blk"))
      .filter(col("a") < col("b"))
    // VERIFY BEFORE DEDUPE: a pair can surface through up to maxDist+1
    // segments, but the verify is a codegen'd keyLen-char compare —
    // re-running it on the ≤(maxDist+1)× duplicated candidates is pure
    // map-side work, while deduping first would shuffle the FULL
    // candidate volume (block² rows); filtering to matches first means
    // the only pair-keyed shuffle carries the result-sized set
    // (measured at /tmp/sf1: 6.3M candidates vs 8.8k matches).
    // Closing distinct MEASURED AND ADJUDICATED (round 14, BENCH_NOTES):
    // it shuffles only the match-sized set (8.8 k rows at /tmp/sf1 —
    // effectively free), and the first-match-segment disjoint union
    // that would remove it (emit at segment i iff the keys disagree on
    // every j < i — the d11 first-band trick) is LOSSY whenever a pair
    // agrees on a dense-EXCLUDED earlier segment, so it needs a
    // does-any-dense-block-exist decision: a localCheckpoint of the
    // block counts split the tagged exchange the self-join reuses
    // (3.19 → 7.34 s sf1) and a separate probe job recomputed the agg
    // (→ 4.42 s) — both rejected; the distinct stays.
    cand
      .withColumn("dist", hammingDist(col("ka"), col("kb"), keyLen))
      .filter(col("dist") <= maxDist)
      .select(col("a"), col("b"), col("dist"))
      .distinct()
  }

  /** Codegen'd positional mismatch count over fixed-length strings —
    * keyLen single-char comparisons fused into one projection (no UDF).
    */
  private[graft] def hammingDist(a: Column, b: Column, keyLen: Int): Column =
    (1 to keyLen).map(i =>
      when(substring(a, i, 1) =!= substring(b, i, 1), 1).otherwise(0))
      .reduce(_ + _)
}
