package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Merge-on-read deletes for the at-rest IVF index
  * (Similarity.deleteFromIvfIndex / readIvfIndexWithDeletes): probe ≡
  * rebuild-without-deleted, base files never rewritten, a rebuild
  * invalidates old tombstones. Oracled end-to-end by v30.
  */
class IvfDeleteSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val e = Tables(spark, sfSmoke).embeddings
  private lazy val corpus = e.filter(col("vec_id") =!= 0)
  private lazy val cb = e.filter(col("vec_id").between(1, 8))
    .select(col("vec_id").cast("int"), col("embedding").cast("array<double>"))
    .as[(Int, Array[Double])].collect().toSeq.sortBy(_._1)
  private def allCells(t: String): Seq[Int] =
    spark.table(t).select(col("cell")).distinct()
      .as[Int].collect().toSeq

  private def snap(df: org.apache.spark.sql.DataFrame) =
    df.select(col("vec_id"), col("cell"))
      .as[(Long, Int)].collect().toSeq.sorted

  test("delete-then-read equals rebuild-without-deleted; base files " +
    "untouched; rebuild clears tombstones") {
    Similarity.writeIvfIndex(corpus, "embedding", cb, "graft_ivf_del_spec")
    // base file inventory BEFORE the delete
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "graft_ivf_del_spec")
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files(): Map[String, Long] = {
      val it = fs.listFiles(wh, true)
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) { val f = it.next()
        b += f.getPath.toString -> f.getModificationTime }
      b.result()
    }
    val before = files()
    Similarity.deleteFromIvfIndex(corpus.filter(col("vec_id") % 7 === 2),
      "vec_id", "embedding", cb, "graft_ivf_del_spec")
    assert(files() == before, "delete rewrote base files")
    // merged read == from-scratch build over the surviving rows
    Similarity.writeIvfIndex(corpus.filter(col("vec_id") % 7 =!= 2),
      "embedding", cb, "graft_ivf_del_ref")
    val got = snap(Similarity.readIvfIndexWithDeletes(spark,
      "graft_ivf_del_spec", "vec_id", allCells("graft_ivf_del_spec")))
    assert(got == snap(spark.table("graft_ivf_del_ref")))
    assert(got.nonEmpty)
    // duplicate tombstones are harmless (anti-join semantics)
    Similarity.deleteFromIvfIndex(corpus.filter(col("vec_id") % 7 === 2),
      "vec_id", "embedding", cb, "graft_ivf_del_spec")
    val again = snap(Similarity.readIvfIndexWithDeletes(spark,
      "graft_ivf_del_spec", "vec_id", allCells("graft_ivf_del_spec")))
    assert(again == got)
    // a rebuild defines a new snapshot: old tombstones must not apply
    Similarity.writeIvfIndex(corpus, "embedding", cb, "graft_ivf_del_spec")
    assert(!spark.catalog.tableExists("graft_ivf_del_spec__dels"))
    val full = snap(Similarity.readIvfIndexWithDeletes(spark,
      "graft_ivf_del_spec", "vec_id", allCells("graft_ivf_del_spec")))
    assert(full.size > got.size)
    spark.sql("DROP TABLE IF EXISTS graft_ivf_del_spec")
    spark.sql("DROP TABLE IF EXISTS graft_ivf_del_spec__dels")
    spark.sql("DROP TABLE IF EXISTS graft_ivf_del_spec__hwm")
    spark.sql("DROP TABLE IF EXISTS graft_ivf_del_ref")
    spark.sql("DROP TABLE IF EXISTS graft_ivf_del_ref__hwm")
  }

  test("delete-then-re-APPEND resurrects the id EXACTLY ONCE: the " +
    "tombstone keeps killing the old physical rows, never the append") {
    Similarity.writeIvfIndex(corpus, "embedding", cb, "graft_ivf_res_spec")
    val slice = corpus.filter(col("vec_id") % 7 === 2)
    Similarity.deleteFromIvfIndex(slice, "vec_id", "embedding", cb,
      "graft_ivf_res_spec")
    Similarity.appendIvfIndex(slice, "embedding", cb, "graft_ivf_res_spec")
    val got = snap(Similarity.readIvfIndexWithDeletes(spark,
      "graft_ivf_res_spec", "vec_id", allCells("graft_ivf_res_spec")))
    // sequence semantics: the tombstone (hwm 0) kills the base copies
    // (__seq 0) of the deleted ids; the appended copies (__seq 1)
    // survive — so the merged read is the full corpus, each id ONCE,
    // with no stale duplicates and no tombstone rewrite
    assert(got == snap(spark.table("graft_ivf_res_spec"))
      .diff(snap(spark.table("graft_ivf_res_spec")
        .filter(col("__seq") === 0 && col("vec_id") % 7 === 2))))
    assert(got.map(_._1).sorted ==
      corpus.select(col("vec_id")).as[Long].collect().toSeq.sorted,
      "each corpus id must appear exactly once after delete+re-append")
    spark.sql("DROP TABLE IF EXISTS graft_ivf_res_spec")
    spark.sql("DROP TABLE IF EXISTS graft_ivf_res_spec__dels")
    spark.sql("DROP TABLE IF EXISTS graft_ivf_res_spec__hwm")
  }

  test("UPDATE via delete-then-append-changed-vector returns only the " +
    "new embedding (the round-12 ADVICE stale-duplicate defect)") {
    Similarity.writeIvfIndex(corpus, "embedding", cb, "graft_ivf_upd_spec")
    val victim = corpus.filter(col("vec_id") === 9)
    Similarity.deleteFromIvfIndex(victim, "vec_id", "embedding", cb,
      "graft_ivf_upd_spec")
    // re-append id 9 with a DIFFERENT vector (vec 10's embedding):
    // the realistic update path — may land in a different cell
    val updated = corpus.filter(col("vec_id") === 10)
      .withColumn("vec_id", lit(9L))
    Similarity.appendIvfIndex(updated, "embedding", cb,
      "graft_ivf_upd_spec")
    val nine = Similarity.readIvfIndexWithDeletes(spark,
        "graft_ivf_upd_spec", "vec_id", allCells("graft_ivf_upd_spec"))
      .filter(col("vec_id") === 9)
      .select(col("cell"), col("embedding").cast("array<double>"))
      .as[(Int, Array[Double])].collect()
    assert(nine.length == 1,
      s"updated id must appear exactly once, got ${nine.length} rows")
    val wantVec = corpus.filter(col("vec_id") === 10)
      .select(col("embedding").cast("array<double>"))
      .as[Array[Double]].collect()(0)
    assert(nine(0)._2.toSeq == wantVec.toSeq,
      "probe returned the stale pre-update embedding")
    spark.sql("DROP TABLE IF EXISTS graft_ivf_upd_spec")
    spark.sql("DROP TABLE IF EXISTS graft_ivf_upd_spec__dels")
    spark.sql("DROP TABLE IF EXISTS graft_ivf_upd_spec__hwm")
  }

  test("tombstones SURVIVE compaction: a hot-cell rewrite preserves the " +
    "__seq axis, so deleted rows stay dead and re-appends stay live") {
    Similarity.writeIvfIndex(corpus, "embedding", cb, "graft_ivf_cmp_spec")
    val slice = corpus.filter(col("vec_id") % 7 === 2)
    Similarity.deleteFromIvfIndex(slice, "vec_id", "embedding", cb,
      "graft_ivf_cmp_spec")
    Similarity.appendIvfIndex(slice, "embedding", cb, "graft_ivf_cmp_spec")
    val before = snap(Similarity.readIvfIndexWithDeletes(spark,
      "graft_ivf_cmp_spec", "vec_id", allCells("graft_ivf_cmp_spec")))
    // base + append = ≥2 files in the re-appended cells → hot; compact
    val rewritten = graft.sources.Compaction.compactHotPartitions(spark,
      "graft_ivf_cmp_spec", "cell", targetRows = 1000000L)
    assert(rewritten.nonEmpty, "append should have made some cell hot")
    val after = snap(Similarity.readIvfIndexWithDeletes(spark,
      "graft_ivf_cmp_spec", "vec_id", allCells("graft_ivf_cmp_spec")))
    assert(after == before, "compaction changed the merged read")
    spark.sql("DROP TABLE IF EXISTS graft_ivf_cmp_spec")
    spark.sql("DROP TABLE IF EXISTS graft_ivf_cmp_spec__dels")
    spark.sql("DROP TABLE IF EXISTS graft_ivf_cmp_spec__hwm")
  }

  test("probe with deletes still prunes: both scans read only the " +
    "probed cells") {
    Similarity.writeIvfIndex(corpus, "embedding", cb, "graft_ivf_del_pin")
    Similarity.deleteFromIvfIndex(corpus.filter(col("vec_id") % 7 === 2),
      "vec_id", "embedding", cb, "graft_ivf_del_pin")
    val cells = allCells("graft_ivf_del_pin").sorted.take(2)
    val probe = Similarity.readIvfIndexWithDeletes(spark,
      "graft_ivf_del_pin", "vec_id", cells).select(col("vec_id"))
    probe.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] =
      (p match {
        case s: FileSourceScanExec => Seq(s)
        case _ => Nil
      }) ++ (p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }).flatMap(allScans)
    val scans = allScans(probe.queryExecution.executedPlan)
      .filter(_.metadata.getOrElse("PartitionFilters", "[]") != "[]")
    // both the base and the tombstone scan carry the cell filter
    assert(scans.size >= 2, s"want base+dels pruned scans, got ${scans.size}")
    assert(scans.forall(_.metrics("numPartitions").value <= 2),
      "a scan read more than the probed cells")
    spark.sql("DROP TABLE IF EXISTS graft_ivf_del_pin")
    spark.sql("DROP TABLE IF EXISTS graft_ivf_del_pin__dels")
  }
}
