package graft.gtfs

import org.apache.spark.sql.SparkSession
import graft.streaming.StreamingJobs

/** Pillar P5 — the reference's GitHub-Actions DAG as one Spark application
  * (SURVEY §3: update-routes → generate-gtfs → zip, with the
  * `git diff --quiet` publish gate replaced by content hashes).
  *
  * Usage: GtfsApp <referenceRootDir> <outDir>
  */
object GtfsApp {
  def main(args: Array[String]): Unit = {
    val Array(rootDir, outDir) = args.take(2)
    val spark = graft.Graft.session()
    run(spark, rootDir, outDir)
    spark.stop()
  }

  /** Build the feed; write + zip only the tables whose content changed
    * since the last run (I2). Returns the per-table content hashes.
    */
  def run(spark: SparkSession, rootDir: String, outDir: String): Map[String, String] = {
    val g = GtfsPipeline.build(spark, rootDir)
    val tables = Map(
      "agency" -> g.agency, "routes" -> g.routes, "stops" -> g.stops,
      "shapes" -> g.shapes, "trips" -> g.trips, "stop_times" -> g.stopTimes,
      "calendar" -> g.calendar)
    val hashes = tables.map { case (n, df) => n -> StreamingJobs.contentHash(df) }

    val hashFile = java.nio.file.Paths.get(outDir, ".content_hashes")
    val previous: Map[String, String] =
      if (java.nio.file.Files.exists(hashFile))
        java.nio.file.Files.readAllLines(hashFile).toArray(Array.empty[String])
          .flatMap { l => l.split("=", 2) match {
            case Array(k, v) => Some(k -> v); case _ => None } }.toMap
      else Map.empty

    if (hashes != previous) {
      GtfsWriter.writeAll(g, outDir)
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
}
