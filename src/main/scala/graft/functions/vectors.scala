package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector kernels (similarity search / embedding near-dup).
  *
  * Computed in DOUBLE regardless of the stored element type (the testdata
  * embeddings are float32): both engines must promote before multiplying or
  * the fold accumulates float error differently. Sequential left-fold
  * summation matches DuckDB's list_dot_product order.
  *
  * Pure higher-order-function compositions — per-row, no shuffle, scale
  * linearly with partition count.
  */
object vectors {

  /** Elementwise cast to double — the native array cast (codegen'd), not
    * a `transform` HOF (interpreted, ~1 ms/row on wide vectors).
    */
  def asDouble(c: Column): Column = c.cast("array<double>")

  /** Dot product of two double arrays (sequential left fold). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double arrays — a native codegen'd
    * expression (graft.plans.CosineSim) with the same sequential-fold FP
    * order as `dot`/`l2norm`; the HOF form runs interpreted and is ~20×
    * slower on wide vectors.
    */
  def cosine(a: Column, b: Column): Column =
    graft.plans.CosineSim.cosineSim(a, b)
}
