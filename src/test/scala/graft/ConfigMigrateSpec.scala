package graft

import org.apache.spark.sql.functions._
import graft.gtfs.ConfigMigrate
import graft.sources.GtfsSources

/** P3 golden test: migrating the reference's old-schema config must equal
  * the output of convert-routes-json/convert.py run on the same input
  * (snapshot at src/test/resources/routes-new-golden.json), compared as
  * flattened route rows and as the category/agency set.
  */
class ConfigMigrateSpec extends SparkTestBase {
  import spark.implicits._

  val oldPath = "/root/reference/convert-routes-json/routes.json"
  val goldenPath = "src/test/resources/routes-new-golden.json"

  test("name parsing kernels (X5–X8)") {
    val rows = Seq(
      "Koridor 1: Leuwipanjang → Soreang",
      "Commuter Line Bandung Raya",
      "Citeureup → Cimindi via Pemkot",
      "→ weird",
      "No arrows here").toDF("n")
      .select(col("n"), ConfigMigrate.simplifyName(col("n")).as("simple"),
        ConfigMigrate.detectDirection(col("n")).as("dir"),
        ConfigMigrate.extractCode(col("n")).as("code"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getInt(2), Option(r.getString(3)))).toMap
    assert(rows("Koridor 1: Leuwipanjang → Soreang") ==
      (("Leuwipanjang → Soreang", 0, Some("1"))))
    assert(rows("Commuter Line Bandung Raya") == (("Bandung Raya", 1, None)))
    assert(rows("Citeureup → Cimindi via Pemkot") ==
      (("Citeureup → Cimindi via Pemkot", 0, None)))
    assert(rows("→ weird")._2 == 1)     // arrow at position 0 → direction 1
    assert(rows("No arrows here")._2 == 1)
  }

  test("originDestVia splits on single arrow only") {
    val (o, d, v) = ConfigMigrate.originDestVia(col("n"))
    val rows = Seq("A → B via C", "A → B → C", "A → B", "plain")
      .toDF("n").select(col("n"), o.as("o"), d.as("d"), v.as("v"))
      .collect().map(r => r.getString(0) ->
        (Option(r.getString(1)), Option(r.getString(2)), Option(r.getString(3)))).toMap
    assert(rows("A → B via C") == ((Some("A"), Some("B"), Some("C"))))
    assert(rows("A → B → C") == ((None, None, None)))
    assert(rows("A → B") == ((Some("A"), Some("B"), None)))
    assert(rows("plain") == ((None, None, None)))
  }

  test("migration equals convert.py output on the reference config") {
    val got = ConfigMigrate.migrate(
        ConfigMigrate.oldRoutes(spark, oldPath))
      .select(concat_ws("|", col("agency_id"), col("mode"), col("group_id"),
        col("group_name"), col("color"), col("loop"), col("new_route_name"),
        col("direction_id"), col("relation_id"), col("first_departure"),
        col("last_departure"), col("trips")).as("row"))
    val cfg = GtfsSources.config(spark, goldenPath)
    val want = GtfsSources.routes(cfg)
      .select(concat_ws("|", col("agency_id"), col("mode"), col("group_id"),
        col("group_name"), col("color"), col("loop"), col("route_name"),
        col("direction_id"), col("relation_id"), col("first_departure"),
        col("last_departure"), col("trips_str")).as("row"))
    val extra = got.exceptAll(want).limit(5).collect()
    val missing = want.exceptAll(got).limit(5).collect()
    assert(extra.isEmpty && missing.isEmpty,
      s"extra=${extra.mkString(" ; ")} missing=${missing.mkString(" ; ")}")
    assert(got.count() == 218)

    // Agency projection (F8 defaults merge incl. the ELF fallback id).
    val gotAg = ConfigMigrate.oldRoutes(spark, oldPath)
      .select("agency_name", "agency_id", "mode", "agency_url").distinct()
    val wantAg = GtfsSources.categories(cfg)
      .select("agency_name", "agency_id", "mode", "agency_url").distinct()
    assert(gotAg.exceptAll(wantAg).isEmpty && wantAg.exceptAll(gotAg).isEmpty)
  }
}
