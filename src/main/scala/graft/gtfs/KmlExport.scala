package graft.gtfs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K3 — KML export (convert-geojson-kml.py): one styled KML document per
  * route from its GeoJSON features; line color is the route color in KML's
  * aabbggrr order (X10), filenames sanitized (X9).
  *
  * The XML assembly runs as a per-row UDF at the sink edge (I/O-bound,
  * config-scale strings); everything upstream is columnar.
  */
object KmlExport {

  /** X10: '#rrggbb' or '#rgb' → 'ffbbggrr'; malformed → 'ff000000'
    * (convert-geojson-kml.py:8-15).
    */
  def kmlColor(hex: Column): Column = {
    val h0 = regexp_replace(hex, "^#", "")
    val h = when(length(h0) === 3, concat(
        substring(h0, 1, 1), substring(h0, 1, 1),
        substring(h0, 2, 1), substring(h0, 2, 1),
        substring(h0, 3, 1), substring(h0, 3, 1)))
      .when(length(h0) === 6, h0)
      .otherwise(lit("000000"))
    concat(lit("ff"), substring(h, 5, 2), substring(h, 3, 2), substring(h, 1, 2))
  }

  /** X9: keep alnum/space/dash/underscore, replace the rest with '_'
    * (convert-geojson-kml.py:5-6).
    */
  def sanitizeFilename(name: Column): Column =
    trim(regexp_replace(name, "[^\\p{Alnum} \\-_]", "_"))

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private val renderUdf = udf {
    (routeName: String, color: String,
     line: Seq[Seq[Double]], stops: Seq[(String, Double, Double)]) =>
      val sb = new StringBuilder
      sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
      sb ++= "<kml xmlns=\"http://www.opengis.net/kml/2.2\"><Document>"
      sb ++= "<ExtendedData>"
      sb ++= s"""<Data name="route-name"><value>${esc(routeName)}</value></Data>"""
      sb ++= "<Data name=\"source\"><value>Transport for Bandung</value></Data>"
      sb ++= "</ExtendedData>"
      if (line != null && line.nonEmpty) {
        sb ++= "<Placemark><name>Route Segment</name>"
        sb ++= s"<Style><LineStyle><color>$color</color><width>4</width></LineStyle></Style>"
        sb ++= "<LineString><coordinates>"
        sb ++= line.map(c => s"${c(0)},${c(1)}").mkString(" ")
        sb ++= "</coordinates></LineString></Placemark>"
      }
      if (stops != null) stops.foreach { case (name, lon, lat) =>
        sb ++= s"<Placemark><name>${esc(Option(name).getOrElse("Stop"))}</name>"
        sb ++= "<Style><IconStyle><Icon><href>http://maps.google.com/mapfiles/kml/pushpin/ylw-pushpin.png</href></Icon></IconStyle></Style>"
        sb ++= s"<Point><coordinates>$lon,$lat</coordinates></Point></Placemark>"
      }
      sb ++= "</Document></kml>"
      sb.toString
  }

  /** Assemble one KML doc per route: input route config rows joined with
    * per-relation line coords and stops. Output (relation_id, filename,
    * kml).
    */
  def kmlDocs(routes: DataFrame, wayLines: DataFrame, stops: DataFrame): DataFrame = {
    val lines = wayLines.groupBy(col("relation_id"))
      .agg(flatten(sort_array(collect_list(
        struct(col("feature_idx").as("fi"), col("coords").as("cs"))))
        .getField("cs")).as("line"))
    val sts = stops.groupBy(col("relation_id"))
      .agg(sort_array(collect_list(struct(col("feature_idx").as("fi"),
        struct(col("stop_name").as("_1"), col("lon").as("_2"),
          col("lat").as("_3")).as("s")))).getField("s").as("stops"))
    routes
      .join(lines, Seq("relation_id"), "left")
      .join(sts, Seq("relation_id"), "left")
      .select(col("relation_id"),
        concat(sanitizeFilename(col("route_name")), lit(".kml")).as("filename"),
        renderUdf(col("route_name"), kmlColor(col("color")),
          col("line"), col("stops")).as("kml"))
  }
}
