package graft

import org.apache.spark.sql.functions._
import graft.sources.{Clone, Warehouse}

/** Shallow clones (sources/Clone): zero data copied at clone time,
  * snapshot isolation in both directions, independent evolution.
  * Oracled end-to-end by s17.
  */
class CloneSpec extends SparkTestBase {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("k"), col("v")).as[(Long, Long)].collect().toSet

  test("clone copies no data files; both sides evolve independently; " +
    "post-clone base appends are invisible to the clone") {
    Warehouse.writeTable(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"),
      "graft_clone_spec_base")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "graft_clone_spec_base")
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def baseFiles(): Map[String, Long] = {
      val it = fs.listFiles(wh, true)
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) { val f = it.next()
        b += f.getPath.toString -> f.getModificationTime }
      b.result()
    }
    val before = baseFiles()
    Clone.shallowClone(spark, "graft_clone_spec_base", "graft_clone_spec_c")
    // zero-copy: the base's files are untouched, and the clone's
    // storage is only a manifest + an EMPTY delta
    assert(baseFiles() == before, "clone touched base files")
    assert(spark.table("graft_clone_spec_c__delta").count() == 0)
    assert(rows(Clone.readClone(spark, "graft_clone_spec_c")) ==
      Set((1L, 10L), (2L, 20L)))
    // divergent evolution
    Clone.appendToClone(Seq((3L, 30L)).toDF("k", "v"),
      "graft_clone_spec_c")
    Warehouse.appendPartitioned(Seq((4L, 40L)).toDF("k", "v"),
      "graft_clone_spec_base")
    assert(rows(spark.table("graft_clone_spec_base")) ==
      Set((1L, 10L), (2L, 20L), (4L, 40L)), "clone append leaked to base")
    assert(rows(Clone.readClone(spark, "graft_clone_spec_c")) ==
      Set((1L, 10L), (2L, 20L), (3L, 30L)),
      "post-clone base append visible to clone")
    Seq("graft_clone_spec_base", "graft_clone_spec_c__manifest",
      "graft_clone_spec_c__delta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("clone of a PARTITIONED base recovers partition-column values " +
    "from directory names") {
    // partition values live in the directory path, not in the data
    // files — without a basePath the snapshot scan would return NULL
    // for every partition column (the round-12 ADVICE defect)
    spark.sql("DROP TABLE IF EXISTS graft_clone_spec_pb")
    // a crashed earlier run can leave the managed location behind with
    // no catalog entry — saveAsTable refuses that; clear it
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "graft_clone_spec_pb")
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(loc, true)
    Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
      .toDF("k", "p", "v").write.partitionBy("p").format("parquet")
      .saveAsTable("graft_clone_spec_pb")
    Clone.shallowClone(spark, "graft_clone_spec_pb", "graft_clone_spec_pc")
    val got = Clone.readClone(spark, "graft_clone_spec_pc")
      .select(col("k"), col("p"), col("v"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L)),
      s"partition values lost: $got")
    // snapshot isolation still holds across a partitioned base append
    // insertInto is positional and a partitioned table stores its
    // partition columns LAST: (k, v, p)
    Seq((4L, 40L, "c")).toDF("k", "v", "p").write.mode("append")
      .format("parquet").insertInto("graft_clone_spec_pb")
    assert(Clone.readClone(spark, "graft_clone_spec_pc").count() == 3)
    Seq("graft_clone_spec_pb", "graft_clone_spec_pc__manifest",
      "graft_clone_spec_pc__delta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("clone of an empty table works: 0-row snapshot, delta evolves") {
    // an empty managed table still carries a schema-bearing parquet
    // file, so the manifest is non-empty and the snapshot reads 0 rows
    Warehouse.writeTable(
      Seq.empty[(Long, Long)].toDF("k", "v"), "graft_clone_spec_e")
    Clone.shallowClone(spark, "graft_clone_spec_e", "graft_clone_spec_ec")
    assert(Clone.readClone(spark, "graft_clone_spec_ec").count() == 0)
    Clone.appendToClone(Seq((9L, 90L)).toDF("k", "v"),
      "graft_clone_spec_ec")
    assert(rows(Clone.readClone(spark, "graft_clone_spec_ec")) ==
      Set((9L, 90L)))
    Seq("graft_clone_spec_e", "graft_clone_spec_ec__manifest",
      "graft_clone_spec_ec__delta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
