package graft.gtfs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Pillar P3 — old→new config-schema migration (convert-routes-json/
  * convert.py): route-name parsing (X5–X8), agency defaults merge (F8),
  * code-based grouping (A3) and the reverse-direction pairing self-join
  * (J7) re-expressed as DataFrame joins + windows.
  *
  * The greedy "used" set of the reference's pairing loop is emulated with
  * two row_number passes (first candidate per left row, then first claim
  * per right row) — identical outcomes whenever candidate pairs are
  * mutually symmetric, which route direction pairs are by construction.
  */
object ConfigMigrate {

  // -- X5–X8 name parsing as Column kernels --------------------------------

  /** X5: strip "Commuter Line"/"Koridor N:" prefix (convert.py:75-77). */
  def simplifyName(c: Column): Column =
    trim(regexp_replace(c, "^(Commuter Line|Koridor \\d+:?)\\s*", ""))

  /** X6: 0 when "→" appears past position 0, else 1 (convert.py:79-82). */
  def detectDirection(c: Column): Column =
    when(instr(c, "→") > 1, 0).otherwise(1)

  /** X7: code before ':' — last whitespace word of the prefix, null when
    * there is no colon (convert.py:84-89).
    */
  def extractCode(c: Column): Column =
    when(c.contains(":"),
      element_at(split(trim(element_at(split(c, ":"), 1)), "\\s+"), -1))

  /** X8a: drop " via …" (convert.py:91-92). */
  def stripVia(c: Column): Column = regexp_replace(c, "\\s+via\\s+.*", "")

  /** X8b: (origin, dest, via) — origin/dest null unless exactly one "→"
    * (convert.py:94-105); via null when absent.
    */
  def originDestVia(c: Column): (Column, Column, Column) = {
    val via = {
      val v = trim(regexp_extract(c, "\\s+via\\s+(.*)", 1))
      when(v =!= "", v)
    }
    val parts = split(stripVia(c), "→")
    val ok = size(parts) === 2
    (when(ok, trim(element_at(parts, 1))), when(ok, trim(element_at(parts, 2))), via)
  }

  // -- F8 agency defaults ---------------------------------------------------

  /** AGENCY_METADATA (convert.py:6-71) as a broadcastable defaults table. */
  def agencyMetadata(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("Metro Jabar Trans", "MJT", "bus", "https://instagram.com/brt.metrojabartrans"),
      ("Trans Metro Bandung", "TMB", "bus", "https://uptangkutan-bandung.id/"),
      ("Bus Kota Damri", "Damri", "bus", "https://damri.co.id/"),
      ("Angkot Kota Bandung", "ABD", "angkot", "https://dishub.bandung.go.id/"),
      ("Angkot Kota Cimahi", "AC", "angkot", ""),
      ("Angkot Kabupaten Bandung Barat", "AKBB", "angkot", ""),
      ("Angkot Kabupaten Bandung", "AKB", "angkot", ""),
      ("Angkot Lintas Wilayah (AKDP)", "AKDP", "angkot", ""))
      .toDF("meta_name", "meta_agency_id", "meta_mode", "meta_url")
  }

  private val OldSchema = StructType(Seq(
    StructField("categories", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("routes", ArrayType(StructType(Seq(
        StructField("name", StringType),
        StructField("relationId", StringType),
        StructField("color", StringType),
        StructField("type", StringType)))))))))))

  /** Old-schema config flattened with ordinals; categories without routes
    * are skipped (convert.py:147-148); F8 defaults merged.
    */
  def oldRoutes(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").schema(OldSchema).json(path)
      .select(posexplode(col("categories")).as(Seq("cat_idx", "cat")))
      .filter(col("cat.routes").isNotNull)
      .select(col("cat_idx"), col("cat.name").as("cat_name"),
        posexplode(col("cat.routes")).as(Seq("route_idx", "rt")))
      .join(broadcast(agencyMetadata(spark)),
        col("cat_name") === col("meta_name"), "left")
      .select(col("cat_idx"), col("route_idx"),
        coalesce(col("meta_name"), col("cat_name")).as("agency_name"),
        coalesce(col("meta_agency_id"), upper(substring(col("cat_name"), 1, 3)))
          .as("agency_id"),
        coalesce(col("meta_mode"), lit("bus")).as("mode"),
        coalesce(col("meta_url"), lit("")).as("agency_url"),
        lit("Asia/Jakarta").as("agency_timezone"), lit("id").as("agency_lang"),
        col("rt.name").as("route_name"), col("rt.relationId").as("relation_id"),
        col("rt.color").as("color"))

  /** The migrated config as flat rows (one per new-schema route):
    * (category fields, group_id, group_name, color, route fields).
    */
  def migrate(old: DataFrame): DataFrame = {
    val base = old
      .withColumn("code", extractCode(col("route_name")))

    // A3: code groups keyed (category, color, code); direction by stable
    // sort on detect_direction then original position (convert.py:166-177).
    val codeW = Window.partitionBy(col("cat_idx"), col("color"), col("code"))
      .orderBy(detectDirection(col("route_name")), col("route_idx"))
    val codeGroups = base.filter(col("code").isNotNull)
      .withColumn("pos", row_number().over(codeW))
      .select(catCols :+ col("code").as("group_id") :+
        concat(col("agency_name"), lit(" "), col("code")).as("group_name") :+
        col("color") :+ simplifyName(col("route_name")).as("new_route_name") :+
        when(col("pos") === 1, 0).otherwise(1).as("direction_id") :+
        col("relation_id"): _*)

    // J7: reverse-direction pairing of the no-code routes.
    val (o, d, v) = originDestVia(col("route_name"))
    val nc = base.filter(col("code").isNull)
      .withColumn("origin", o).withColumn("dest", d).withColumn("via", v)
      .filter(col("origin").isNotNull && col("dest").isNotNull)
    val l = nc.select(col("cat_idx"), col("route_idx").as("i"),
      col("origin").as("oi"), col("dest").as("di"), col("via").as("vi"),
      col("route_name").as("name_i"))
    val r = nc.select(col("cat_idx").as("cat_idx_r"), col("route_idx").as("j"),
      col("origin").as("oj"), col("dest").as("dj"), col("via").as("vj"))
    val firstJ = Window.partitionBy(col("cat_idx"), col("i")).orderBy(col("j"))
    val firstI = Window.partitionBy(col("cat_idx"), col("j")).orderBy(col("i"))
    val pairs = l.join(r,
        col("cat_idx") === col("cat_idx_r") &&
          col("oj") === col("di") && col("dj") === col("oi") &&
          col("vi") <=> col("vj") && col("i") < col("j"))
      .withColumn("rj", row_number().over(firstJ)).filter(col("rj") === 1)
      .withColumn("ri", row_number().over(firstI)).filter(col("ri") === 1)
      .select(col("cat_idx"), col("i"), col("j"), trim(col("name_i")).as("base_name"))

    val pairRoutes = pairs
      .select(col("cat_idx"), col("base_name"),
        explode(array(
          struct(col("i").as("route_idx"), lit(0).as("direction_id")),
          struct(col("j").as("route_idx"), lit(1).as("direction_id")))).as("m"))
      .select(col("cat_idx"), col("base_name"),
        col("m.route_idx").as("route_idx"), col("m.direction_id"))
      .join(base, Seq("cat_idx", "route_idx"))
      .select(catCols :+ col("base_name").as("group_id") :+
        col("base_name").as("group_name") :+ col("color") :+
        simplifyName(col("route_name")).as("new_route_name") :+
        col("direction_id") :+ col("relation_id"): _*)

    codeGroups.unionByName(pairRoutes)
      .withColumn("type", lit("fixed")).withColumn("loop", lit("no"))
      .withColumn("first_departure", lit("04:00"))
      .withColumn("last_departure", lit("18:00"))
      .withColumn("trips", lit("85"))
  }

  private val catCols: Seq[Column] = Seq(col("cat_idx"), col("agency_name"),
    col("agency_id"), col("mode"), col("agency_url"), col("agency_timezone"),
    col("agency_lang"))
}
