package graft

import graft.sources.Versioned
import org.apache.spark.sql.functions._

class VersionedSpec extends SparkTestBase {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("versioned table: commit history, zero-copy rollback, divergence") {
    val t = "graft_vtest"
    Versioned.create(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    Versioned.commitAppend(spark, Seq((3L, "c")).toDF("k", "v"), t)
    Versioned.commitAppend(spark, Seq((4L, "d")).toDF("k", "v"), t)
    assert(Versioned.currentVersion(spark, t) == 3L)
    // every version reads exactly its commit-time state
    assert(rows(Versioned.readVersion(spark, t, 1)) ==
      Set(1L -> "a", 2L -> "b"))
    assert(rows(Versioned.readVersion(spark, t, 2)) ==
      Set(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(rows(Versioned.readVersion(spark, t, 3)) ==
      Set(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))

    // rollback to v2: current state == v2, ZERO data movement, history
    // (v3 included) still readable
    val filesBefore = spark.table("graft_vtest__data").inputFiles.toSet
    val v4 = Versioned.rollbackTo(spark, t, 2L)
    assert(v4 == 4L && Versioned.currentVersion(spark, t) == 4L)
    assert(spark.table("graft_vtest__data").inputFiles.toSet == filesBefore,
      "rollback must not move data")
    assert(rows(Versioned.readCurrent(spark, t)) ==
      rows(Versioned.readVersion(spark, t, 2)))
    assert(rows(Versioned.readVersion(spark, t, 3)) ==
      Set(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"),
      "rolled-over version must stay readable")

    // a commit after the rollback diverges from v3 (no resurrection)
    val v5 = Versioned.commitAppend(spark, Seq((5L, "e")).toDF("k", "v"), t)
    assert(v5 == 5L)
    assert(rows(Versioned.readVersion(spark, t, 5)) ==
      Set(1L -> "a", 2L -> "b", 3L -> "c", 5L -> "e"))

    // rollback of a rollback: back to the full v3 state
    Versioned.rollbackTo(spark, t, 3L)
    assert(rows(Versioned.readCurrent(spark, t)) ==
      Set(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))

    // guard: target outside history fails loudly
    intercept[IllegalArgumentException] {
      Versioned.rollbackTo(spark, t, 99L)
    }
  }

  test("create of an empty frame yields a usable v1 (Spark writes an " +
    "empty part file) — and later commits work") {
    // the require in create is the fallback for writers that emit ZERO
    // files for empty input; this Spark writes one empty part, so the
    // table must simply work
    Versioned.create(spark,
      Seq((1L, "a")).toDF("k", "v").limit(0), "graft_vempty")
    assert(Versioned.currentVersion(spark, "graft_vempty") == 1L)
    assert(Versioned.readVersion(spark, "graft_vempty", 1).isEmpty)
    Versioned.commitAppend(spark, Seq((9L, "z")).toDF("k", "v"),
      "graft_vempty")
    assert(rows(Versioned.readCurrent(spark, "graft_vempty")) ==
      Set(9L -> "z"))
  }
}
