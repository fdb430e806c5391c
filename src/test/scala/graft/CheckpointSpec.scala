package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import graft.graph.Routing
import graft.operators.Dedup

/** Reliable-checkpoint mode for the iterative frontier loops
  * (Routing.sssp/bfsHops, Dedup.dupClusters): with `checkpointDir` set,
  * every round materializes through `Dataset.checkpoint` (HDFS-style
  * reliable storage — survives executor loss on a cluster, unlike the
  * default `localCheckpoint`, whose blocks are pinned to executors).
  * Results must be identical to the default path, and checkpoint rdd
  * files must actually land in the directory.
  *
  * Also pins the dupClusters `pairsCanonical` contract: the flag must be
  * a pure plan shortcut (identical clusters), and with
  * `spark.graft.debug.validate=true` a violating caller fails loudly.
  */
class CheckpointSpec extends SparkTestBase {
  import spark.implicits._

  private def withTempDir[A](f: Path => A): A = {
    val dir = Files.createTempDirectory("graft-ckpt")
    try f(dir)
    finally {
      // best-effort cleanup; checkpoint files are plain data
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => try Files.deleteIfExists(p) catch { case _: Throwable => () })
    }
  }

  private def rddCheckpointFiles(dir: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    Files.walk(dir).iterator().asScala
      .filter(_.getFileName.toString.startsWith("rdd-")).toSeq
  }

  private lazy val fixtureEdges = Seq(
    ("A", "B", "r1", 1.0), ("B", "C", "r1", 2.0), ("C", "D", "r1", 3.0),
    ("A", "C", "r2", 2.5), ("C", "E", "r3", 1.0)
  ).toDF("src", "dst", "route_id", "weight_m")

  test("bfsHops with a reliable checkpoint dir: same result, files written") {
    withTempDir { dir =>
      val got = Routing.bfsHops(fixtureEdges, "A", 10,
          checkpointDir = Some(dir.toString))
        .as[(String, Int)].collect().toMap
      assert(got == Map("A" -> 0, "B" -> 1, "C" -> 1, "D" -> 2, "E" -> 2))
      assert(rddCheckpointFiles(dir).nonEmpty,
        "reliable mode must write rdd checkpoints into the supplied dir")
    }
  }

  test("sssp with a reliable checkpoint dir matches the default path") {
    withTempDir { dir =>
      val default = Routing.sssp(fixtureEdges, "A")
        .select("node", "dist_m").as[(String, Double)].collect().toMap
      val reliable = Routing.sssp(fixtureEdges, "A",
          checkpointDir = Some(dir.toString))
        .select("node", "dist_m").as[(String, Double)].collect().toMap
      assert(reliable == default)
      assert(rddCheckpointFiles(dir).nonEmpty)
    }
  }

  test("dupClusters with a reliable checkpoint dir matches the default path") {
    withTempDir { dir =>
      val pairs = Seq((5L, 3L), (9L, 5L), (2L, 8L), (1L, 4L)).toDF("a", "b")
      val default = Dedup.dupClusters(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val reliable = Dedup.dupClusters(pairs,
          checkpointDir = Some(dir.toString)).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reliable == default)
      assert(rddCheckpointFiles(dir).nonEmpty)
    }
  }

  test("dupClusters broadcastFrontier changes the plan, not the clusters") {
    val pairs = Seq((3L, 5L), (5L, 9L), (2L, 8L), (1L, 4L)).toDF("a", "b")
    val default = Dedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bcast = Dedup.dupClusters(pairs, broadcastFrontier = true).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bcast == default)
  }

  test("dupClusters pairsCanonical is a pure plan shortcut") {
    // canonical: distinct rows, a < b everywhere (chain + pair + pair)
    val pairs = Seq((3L, 5L), (5L, 9L), (2L, 8L), (1L, 4L)).toDF("a", "b")
    val default = Dedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val canonical = Dedup.dupClusters(pairs, pairsCanonical = true).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(canonical == default)
    assert(canonical == Map(3L -> 3L, 5L -> 3L, 9L -> 3L,
      2L -> 2L, 8L -> 2L, 1L -> 1L, 4L -> 1L))
  }

  test("r04's real query runs reliable checkpoints + canonical validation") {
    // drives the actual SparkEntry entry (not a fixture): checkpointDir
    // arrives through spark.graft.checkpoint.dir, pairsCanonical=true is
    // validated (debug flag on), and the result must equal the default
    // localCheckpoint path
    withTempDir { dir =>
      spark.conf.set("spark.graft.debug.validate", "true")
      spark.conf.set("spark.graft.checkpoint.dir", dir.toString)
      try {
        // r04's seed-sampled projection: (seed, cluster label, size)
        val reliable = SparkEntry.queries("r04_cc_trade_graph")(spark, sfSmoke)
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
        assert(rddCheckpointFiles(dir).nonEmpty,
          "query did not write reliable checkpoints")
        spark.conf.unset("spark.graft.checkpoint.dir")
        val default = SparkEntry.queries("r04_cc_trade_graph")(spark, sfSmoke)
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
        assert(reliable == default && reliable.nonEmpty)
      } finally {
        spark.conf.unset("spark.graft.checkpoint.dir")
        spark.conf.unset("spark.graft.debug.validate")
      }
    }
  }

  test("debug validation rejects non-canonical input loudly") {
    spark.conf.set("spark.graft.debug.validate", "true")
    try {
      // a >= b on one row
      val swapped = Seq((5L, 3L), (1L, 4L)).toDF("a", "b")
      assertThrows[IllegalArgumentException](
        Dedup.dupClusters(swapped, pairsCanonical = true))
      // duplicate row
      val dup = Seq((1L, 4L), (1L, 4L)).toDF("a", "b")
      assertThrows[IllegalArgumentException](
        Dedup.dupClusters(dup, pairsCanonical = true))
      // a clean canonical input still passes with validation on
      val ok = Dedup.dupClusters(Seq((1L, 4L)).toDF("a", "b"),
        pairsCanonical = true).collect()
      assert(ok.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
        Map(1L -> 1L, 4L -> 1L))
    } finally spark.conf.unset("spark.graft.debug.validate")
  }
}
