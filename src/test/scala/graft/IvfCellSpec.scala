package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Parity + codegen-width pin for the native IVF cell-assignment kernel
  * (graft.plans.IvfCell) against the literal when-chain form it replaced
  * (Similarity.ivfCellWhenChain, kept test-only as the oracle — the
  * PqEncode/pqCodesHof pattern). The when-chain's generated code grows
  * O(nlist²); the kernel must stay inside whole-stage codegen at
  * production codebook sizes (nlist ≥ 256), which is pinned here.
  */
class IvfCellSpec extends SparkTestBase {
  import spark.implicits._

  private def embeddings = spark.read.parquet(s"$sfSmoke/embeddings.parquet")

  private def codebook8 = embeddings
    .filter(col("vec_id").between(1, 8))
    .select(col("vec_id"), col("embedding"))
    .collect()
    .map(r => r.getLong(0).toInt -> r.getSeq[Float](1).map(_.toDouble).toArray)
    .toSeq

  test("kernel == when-chain on the sf0.001 embeddings") {
    val e = embeddings
    val cb = codebook8
    val n = e.select(
        Similarity.ivfCell(col("embedding"), cb).as("k"),
        Similarity.ivfCellWhenChain(col("embedding"), cb).as("w"))
      .filter(col("k") =!= col("w")).count()
    assert(n == 0, s"$n rows diverge")
  }

  test("kernel == when-chain on ties, NaN (zero vector), null, bad length") {
    // duplicate centroid under two cids → rounded-cosine tie → smallest
    // cid must win in both forms; a zero vector scores NaN against every
    // centroid (NaN greatest + NaN==NaN semantics); null and a
    // wrong-length vector fall through to -1 in both forms
    val ctr = Array(1.0, 2.0, -3.0, 0.5)
    val cb = Seq(3 -> Array(0.9, 2.1, -2.9, 0.4), 5 -> ctr, 9 -> ctr.clone())
    val vecs = spark.sql(
      """SELECT * FROM VALUES
        | (array(1.0D, 2.0D, -3.0D, 0.5D)),
        | (array(0.0D, 0.0D, 0.0D, 0.0D)),
        | (CAST(null AS array<double>)),
        | (array(1.0D, 2.0D)),
        | (array(-1.0D, -2.0D, 3.0D, -0.5D))
        |AS t(v)""".stripMargin)
    val rows = vecs.select(
        Similarity.ivfCell(col("v"), cb).as("k"),
        Similarity.ivfCellWhenChain(col("v"), cb).as("w"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), s"diverge: $r"))
    // the tie row (exact centroid match under cids 5 and 9) → 5
    assert(rows(0).getInt(0) == 5)
    // null + wrong length → -1
    assert(rows(2).getInt(0) == -1 && rows(3).getInt(0) == -1)
  }

  test("kernel == when-chain on random vectors at nlist=64") {
    // 64 is as wide as the when-chain ORACLE can affordably go (its
    // expression tree is O(nlist²) — at 256 that's ~65k cosine nodes
    // and analysis alone would dominate the suite); kernel semantics
    // are nlist-independent, so parity here + the 256 codegen pin
    // below cover the production shape
    val rnd = new scala.util.Random(7)
    def vec(d: Int) = Array.fill(d)(rnd.nextGaussian())
    val cb = (1 to 64).map(c => c -> vec(8))
    val data = (1 to 300).map(i => (i, vec(8).toSeq)).toDF("id", "v")
      .select(col("id"), col("v").cast("array<double>").as("v"))
    val n = data.select(
        Similarity.ivfCell(col("v"), cb).as("k"),
        Similarity.ivfCellWhenChain(col("v"), cb).as("w"))
      .filter(col("k") =!= col("w")).count()
    assert(n == 0, s"$n rows diverge at nlist=64")
  }

  test("kernel stays in whole-stage codegen at nlist=256") {
    val rnd = new scala.util.Random(42)
    def vec(d: Int) = Array.fill(d)(rnd.nextGaussian())
    val cb256 = (1 to 256).map(c => c -> vec(8))
    // repartition keeps the projection OFF the local relation —
    // ConvertToLocalRelation would otherwise evaluate the deterministic
    // kernel at optimization time, leaving zero codegen subtrees to pin
    // (a real table scan, the shape under test, can't be folded)
    val data = (1 to 200).map(i => (i, vec(8).toSeq)).toDF("id", "v")
      .select(col("id"), col("v").cast("array<double>").as("v"))
      .repartition(4)
    // codegen explain can't see through AdaptiveSparkPlan (same caveat
    // as PlanSpec's q01 codegen test)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = data.select(col("id"),
        Similarity.ivfCell(col("v"), cb256).as("cell"))
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      val m = "Found (\\d+) WholeStageCodegen subtrees".r.findFirstMatchIn(plan)
      assert(m.exists(_.group(1).toInt >= 1), s"no codegen subtree:\n${plan.take(400)}")
      // the generated projection is ONE call into the referenced
      // codebook — O(1) source regardless of nlist, which is the
      // entire point vs the when-chain
      assert(plan.contains(".cell("),
        s"kernel call not in generated code:\n${plan.take(2000)}")
      // codegen and interpreted eval must agree at this width
      val gen = df.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      val prevWsc = spark.conf.get("spark.sql.codegen.wholeStage")
      val prevFactory = spark.conf.get("spark.sql.codegen.factoryMode")
      val interp = try {
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
        data.select(col("id"), Similarity.ivfCell(col("v"), cb256).as("cell"))
          .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      } finally {
        spark.conf.set("spark.sql.codegen.wholeStage", prevWsc)
        spark.conf.set("spark.sql.codegen.factoryMode", prevFactory)
      }
      assert(gen == interp, "codegen and interpreted eval diverge at nlist=256")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
