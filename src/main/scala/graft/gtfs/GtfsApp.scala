package graft.gtfs

import org.apache.spark.sql.SparkSession
import graft.streaming.StreamingJobs

/** Pillar P5 — the reference's GitHub-Actions DAG as one Spark application
  * (SURVEY §3: update-routes → generate-gtfs → zip, with the
  * `git diff --quiet` publish gate replaced by content hashes).
  *
  * Usage: GtfsApp <referenceRootDir> <outDir> [--lint]
  */
object GtfsApp {
  def main(args: Array[String]): Unit = {
    val Array(rootDir, outDir) = args.take(2)
    val lint = args.drop(2).contains("--lint")
    val spark = graft.Graft.session()
    val t0 = System.nanoTime()
    run(spark, rootDir, outDir, lint)
    println(f"[gtfs] pipeline (build+hash+write+zip) took " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s (excl. session startup)")
    spark.stop()
  }

  /** Build the feed; write + zip only the tables whose content changed
    * since the last run (I2). Returns the per-table content hashes.
    *
    * `lint = true` adds a FEED-QA GATE before any byte is written — the
    * s16 write–audit–publish shape applied to the GTFS pillar: the
    * built tables run through [[FeedLint.lint]] and a violation aborts
    * the publish with the offending rules in the message (nothing
    * lands, the content-hash file is untouched, the next clean run
    * publishes normally). Off by default: the reference DAG has no
    * such gate, and the benchmarked app must time the reference's
    * work, not more.
    */
  def run(spark: SparkSession, rootDir: String, outDir: String,
          lint: Boolean = false): Map[String, String] = {
    val built = GtfsPipeline.build(spark, rootDir)
    // materialize each table once: the content hash and the CSV write
    // would otherwise each recompute the full per-relation pipeline
    // (measured 38 s -> ~20 s end-to-end on the reference feed).
    // CONCURRENTLY: the seven tables are independent DAGs and Spark
    // schedules concurrent jobs fine; sequential materialization left
    // the cluster idle between stages (measured 8.6 -> 5.5 s, end-to-end
    // 21.0 -> 18.1 s; outputs byte-identical, goldens green).
    val tB = System.nanoTime()
    def ck(n: String, df: org.apache.spark.sql.DataFrame) = {
      val t = System.nanoTime()
      val r = df.localCheckpoint()
      println(f"[gtfs]     $n ${(System.nanoTime() - t) / 1e9}%.1f s")
      r
    }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val futures = Seq(
      "agency" -> built.agency, "routes" -> built.routes,
      "stops" -> built.stops, "shapes" -> built.shapes,
      "trips" -> built.trips, "stop_times" -> built.stopTimes,
      "calendar" -> built.calendar)
      .map { case (n, df) => Future(ck(n, df)) }
    val Seq(agM, rtM, stM, shM, trM, sttM, calM) =
      futures.map(Await.result(_, scala.concurrent.duration.Duration.Inf))
    val g = GtfsPipeline.Gtfs(agM, rtM, stM, shM, trM, sttM, calM)
    println(f"[gtfs]   build+materialize ${(System.nanoTime() - tB) / 1e9}%.1f s")
    val tables = Map(
      "agency" -> g.agency, "routes" -> g.routes, "stops" -> g.stops,
      "shapes" -> g.shapes, "trips" -> g.trips, "stop_times" -> g.stopTimes,
      "calendar" -> g.calendar)
    val tH = System.nanoTime()
    // the publish gate must also see the hand-maintained pass-through
    // tables (fares/transfers): the reference's `git diff --quiet` gate
    // covers the whole gtfs dir, so an edit to fare_rules.txt alone must
    // trigger a re-publish even when every generated table is unchanged
    val passThroughHashes: Map[String, String] = {
      val src = java.nio.file.Paths.get(rootDir, "gtfs")
      if (!java.nio.file.Files.isDirectory(src)) Map.empty
      else {
        val stream = java.nio.file.Files.list(src)
        try {
          import scala.jdk.CollectionConverters._
          stream.iterator().asScala
            .filter(p => java.nio.file.Files.isRegularFile(p) &&
              p.getFileName.toString.endsWith(".txt") &&
              !GtfsWriter.FieldOrder.contains(p.getFileName.toString))
            .map { p =>
              val md = java.security.MessageDigest.getInstance("MD5")
              s"file:${p.getFileName}" ->
                md.digest(java.nio.file.Files.readAllBytes(p))
                  .map("%02x".format(_)).mkString
            }.toMap
        } finally stream.close()
      }
    }
    val hashes = tables.map { case (n, df) =>
      n -> StreamingJobs.contentHash(df) } ++ passThroughHashes
    println(f"[gtfs]   content hashes ${(System.nanoTime() - tH) / 1e9}%.1f s")

    val hashFile = java.nio.file.Paths.get(outDir, ".content_hashes")
    val previous: Map[String, String] =
      if (java.nio.file.Files.exists(hashFile))
        java.nio.file.Files.readAllLines(hashFile).toArray(Array.empty[String])
          .flatMap { l => l.split("=", 2) match {
            case Array(k, v) => Some(k -> v); case _ => None } }.toMap
      else Map.empty

    if (hashes != previous) {
      // audit BEFORE publish, but only when a publish would happen at
      // all: an unchanged feed skips the gate (and cannot be wedged by
      // a latent violation it already shipped). The lint runs over the
      // already-materialized tables (localCheckpoints above), so each
      // rule is a cheap scan, not a pipeline recompute.
      if (lint) lintGate(g)
      val tW = System.nanoTime()
      GtfsWriter.writeAll(g, outDir)
      println(f"[gtfs]   writeAll ${(System.nanoTime() - tW) / 1e9}%.1f s")
      // hand-maintained tables (fares, transfers) ride along with the
      // generated ones, matching the reference's whole-dir zip
      GtfsWriter.passThroughTables(s"$rootDir/gtfs", outDir)
      GtfsWriter.zipFeed(outDir, s"$outDir/gtfs.zip")
      java.nio.file.Files.createDirectories(hashFile.getParent)
      java.nio.file.Files.writeString(hashFile,
        hashes.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString("\n"))
    }
    hashes
  }

  /** The publish gate itself, separated so the abort path is directly
    * testable: throws with the offending rules if the feed fails lint.
    */
  private[graft] def lintGate(g: GtfsPipeline.Gtfs): Unit = {
    val dirty = FeedLint.lint(g)
      .filter(org.apache.spark.sql.functions.col("n_violations") > 0)
      .collect() // O(#checks) rows by construction
    require(dirty.isEmpty,
      s"feed failed lint, publish aborted: ${dirty.mkString("; ")}")
  }
}
