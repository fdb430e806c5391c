package graft

import org.apache.spark.sql.functions._
import graft.sources.{Backfill, Warehouse}

/** Dynamic partition backfill (sources/Backfill): only the partitions
  * present in the incoming frame are rewritten, untouched directories
  * stay byte-identical, re-running converges (idempotent), and the
  * session's overwrite mode is restored. Oracled end-to-end by s18.
  */
class BackfillSpec extends SparkTestBase {
  import spark.implicits._

  private def rows(t: String) = spark.table(t)
    .select(col("k"), col("v"), col("part"))
    .as[(Long, Long, String)].collect().toSet

  test("backfill rewrites ONLY the named partition; others byte-identical; " +
    "re-run idempotent; overwrite mode restored") {
    Warehouse.writePartitioned(Seq(
        (1L, 10L, "a"), (2L, 20L, "a"), (3L, 99L, "b"), (4L, 40L, "c"))
      .toDF("k", "v", "part"), "graft_backfill_spec", Seq("part"))
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "graft_backfill_spec")
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files(sub: String): Map[String, Long] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(wh, sub), true)
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) { val f = it.next()
        b += f.getPath.toString -> f.getModificationTime }
      b.result()
    }
    val aBefore = files("part=a"); val cBefore = files("part=c")
    val modeBefore = spark.conf
      .getOption("spark.sql.sources.partitionOverwriteMode")
    // fix partition b: 99 was wrong, the corrected slice has two rows
    Backfill.overwritePartitions(
      Seq((3L, 30L, "b"), (5L, 50L, "b")).toDF("k", "v", "part"),
      "graft_backfill_spec")
    assert(rows("graft_backfill_spec") == Set(
      (1L, 10L, "a"), (2L, 20L, "a"), (3L, 30L, "b"), (5L, 50L, "b"),
      (4L, 40L, "c")))
    assert(files("part=a") == aBefore, "partition a was rewritten")
    assert(files("part=c") == cBefore, "partition c was rewritten")
    assert(spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      == modeBefore, "overwrite mode leaked")
    // idempotence: the same backfill again converges to the same rows
    Backfill.overwritePartitions(
      Seq((3L, 30L, "b"), (5L, 50L, "b")).toDF("k", "v", "part"),
      "graft_backfill_spec")
    assert(rows("graft_backfill_spec") == Set(
      (1L, 10L, "a"), (2L, 20L, "a"), (3L, 30L, "b"), (5L, 50L, "b"),
      (4L, 40L, "c")))
    assert(files("part=a") == aBefore && files("part=c") == cBefore)
    spark.sql("DROP TABLE IF EXISTS graft_backfill_spec")
  }
}
