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
    spark.sql("DROP TABLE IF EXISTS graft_ivf_del_ref")
  }

  test("delete-then-re-APPEND resurrects the id: probe equals the full " +
    "corpus again (the append clears matching tombstones)") {
    Similarity.writeIvfIndex(corpus, "embedding", cb, "graft_ivf_res_spec")
    val slice = corpus.filter(col("vec_id") % 7 === 2)
    Similarity.deleteFromIvfIndex(slice, "vec_id", "embedding", cb,
      "graft_ivf_res_spec")
    Similarity.appendIvfIndex(slice, "embedding", cb, "graft_ivf_res_spec")
    val got = snap(Similarity.readIvfIndexWithDeletes(spark,
      "graft_ivf_res_spec", "vec_id", allCells("graft_ivf_res_spec")))
    // the re-added rows are back (multiset: base still holds the
    // original physical rows plus the appended copies of the same ids —
    // dedup of physical duplicates is the caller's compaction concern;
    // the CONTRACT here is that no live id is swallowed by a stale
    // tombstone)
    val want = snap(spark.table("graft_ivf_res_spec"))
    assert(got == want)
    assert(got.map(_._1).toSet ==
      corpus.select(col("vec_id")).as[Long].collect().toSet)
    spark.sql("DROP TABLE IF EXISTS graft_ivf_res_spec")
    spark.sql("DROP TABLE IF EXISTS graft_ivf_res_spec__dels")
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
