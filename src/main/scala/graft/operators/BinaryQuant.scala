package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** 1-bit BINARY quantization — the sign-bit code modern vector stores
  * ship as their cheapest tier (one bit per dimension: 64× smaller than
  * float32, 8× smaller than SQ8): bit j of a vector's code is
  * `x_j ≥ 0`, packed into 32-bit words, and the candidate metric is
  * HAMMING distance (a pure xor + popcount — no float math at all in
  * the scan). For normalized embeddings the Hamming distance is a
  * monotone proxy for angular distance in expectation (each sign
  * agreement is a half-space test — the 1-bit case of the v15 random
  * projection family with the identity basis), so the standard shape is
  * hamming-prune → exact re-rank, like PQ's ADC (v08/v09).
  *
  * Determinism, for the oracle: `x ≥ 0` is an exact predicate, packing
  * order is fixed (first dimension = high bit of word 0), and ties
  * break by id — the candidate set and the final top-k are pure
  * functions of the data, hash-matchable cross-engine.
  *
  * Scale shape: encoding is a per-row expression (no join/shuffle —
  * HOF-interpreted, paid once; store codes at rest like v12/v14 for the
  * recurring path); the hamming scan reads 2 longs per 64-dim row
  * instead of 64 floats; top-k by (hamming, id) is TakeOrdered —
  * map-side partial top-k per partition, driver merges k rows, never a
  * global sort.
  */
object BinaryQuant {

  /** Packed sign code: array of ⌈dims/32⌉ longs, each holding 32 sign
    * bits (values in [0, 2³²) — 32-bit words sidestep both engines'
    * signed-overflow rules; shifts are bitwise, never ANSI-checked).
    */
  def bqCode(vec: Column, dims: Int): Column = {
    require(dims > 0 && dims % 32 == 0, s"dims must be a multiple of 32, got $dims")
    val v = graft.functions.vectors.asDouble(vec)
    transform(sequence(lit(0), lit(dims / 32 - 1)), w =>
      aggregate(slice(v, w * 32 + 1, lit(32)), lit(0L),
        (acc, x) => shiftleft(acc, 1)
          .bitwiseOR(when(x >= 0, lit(1L)).otherwise(lit(0L)))))
  }

  /** Hamming distance between two packed codes (equal word counts). */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), _ + _)

  /** Driver-side encode of a query vector — same packing, bit for bit
    * (the query code is a literal, like PQ's LUT).
    */
  def bqCodeLocal(vec: Array[Double]): Array[Long] = {
    require(vec.length % 32 == 0, s"dims must be a multiple of 32, got ${vec.length}")
    vec.grouped(32).map(_.foldLeft(0L)((acc, x) =>
      (acc << 1) | (if (x >= 0) 1L else 0L))).toArray
  }
}
