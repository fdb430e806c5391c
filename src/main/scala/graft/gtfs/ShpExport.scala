package graft.gtfs

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K4 — Shapefile export (convert-geojson-shp.py): per route, LineString
  * features → `route_lines.shp`, Point features → `stops.shp`, each with
  * attributes (route metadata + feature props) and CRS EPSG:4326 (.prj).
  *
  * Pure-Scala ESRI shapefile writer (the published whitepaper format —
  * .shp geometry + .shx index + dBASE III .dbf attributes + .prj WKT); the
  * toolchain ships no GIS libraries. Like the reference (and K2/K3), the
  * assembly runs at the sink edge on config-scale data: one route's
  * features are bounded, so the per-route collect is the same pattern as
  * the GeoJSON/KML writers.
  */
object ShpExport {

  val Wgs84Wkt: String =
    """GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",""" +
      """SPHEROID["WGS_1984",6378137.0,298.257223563]],""" +
      """PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]"""

  // ---- low-level binary writers -----------------------------------------

  /** One geometry: Point → single part with one coordinate; (Multi)
    * LineString → one part per line. Coordinates are (lon, lat).
    */
  final case class Geom(parts: Seq[Seq[(Double, Double)]])

  private val PointType = 1
  private val PolyLineType = 3

  private def bbox(gs: Seq[Geom]): (Double, Double, Double, Double) = {
    val pts = gs.flatMap(_.parts.flatten)
    (pts.map(_._1).min, pts.map(_._2).min, pts.map(_._1).max, pts.map(_._2).max)
  }

  private def mainHeader(fileWords: Int, shapeType: Int,
                         box: (Double, Double, Double, Double)): Array[Byte] = {
    val b = ByteBuffer.allocate(100)
    b.order(ByteOrder.BIG_ENDIAN)
    b.putInt(9994); (1 to 5).foreach(_ => b.putInt(0)); b.putInt(fileWords)
    b.order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(1000).putInt(shapeType)
    b.putDouble(box._1).putDouble(box._2).putDouble(box._3).putDouble(box._4)
    b.putDouble(0).putDouble(0).putDouble(0).putDouble(0)
    b.array()
  }

  private def pointRecord(g: Geom): Array[Byte] = {
    val (x, y) = g.parts.head.head
    val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(PointType).putDouble(x).putDouble(y)
    b.array()
  }

  private def polylineRecord(g: Geom): Array[Byte] = {
    val nPts = g.parts.map(_.size).sum
    val b = ByteBuffer.allocate(4 + 32 + 8 + 4 * g.parts.size + 16 * nPts)
      .order(ByteOrder.LITTLE_ENDIAN)
    val box = bbox(Seq(g))
    b.putInt(PolyLineType)
    b.putDouble(box._1).putDouble(box._2).putDouble(box._3).putDouble(box._4)
    b.putInt(g.parts.size).putInt(nPts)
    g.parts.scanLeft(0)(_ + _.size).init.foreach(b.putInt)
    g.parts.flatten.foreach { case (x, y) => b.putDouble(x); b.putDouble(y) }
    b.array()
  }

  /** Write base.shp + base.shx + base.dbf + base.prj. All attribute values
    * are written as dBASE character fields (names truncated to 10 bytes,
    * widths fitted, like fiona/geopandas does).
    */
  def writeShapefile(dir: Path, base: String, shapeType: Int, geoms: Seq[Geom],
                     fields: Seq[String], rows: Seq[Seq[String]]): Unit = {
    require(geoms.nonEmpty, "shapefile needs at least one geometry")
    require(rows.forall(_.size == fields.size), "attr row arity mismatch")
    Files.createDirectories(dir)
    val contents = geoms.map { g =>
      if (shapeType == PointType) pointRecord(g) else polylineRecord(g)
    }
    // .shp
    val shp = new ByteArrayOutputStream()
    val shpD = new DataOutputStream(shp)
    val fileWords = 50 + contents.map(c => 4 + c.length / 2).sum
    shpD.write(mainHeader(fileWords, shapeType, bbox(geoms)))
    var recNo = 1
    var offsetWords = 50
    val shxEntries = Vector.newBuilder[(Int, Int)]
    contents.foreach { c =>
      shpD.writeInt(recNo); shpD.writeInt(c.length / 2) // BE record header
      shpD.write(c)
      shxEntries += ((offsetWords, c.length / 2))
      offsetWords += 4 + c.length / 2
      recNo += 1
    }
    Files.write(dir.resolve(s"$base.shp"), shp.toByteArray)
    // .shx
    val shx = new ByteArrayOutputStream()
    val shxD = new DataOutputStream(shx)
    shxD.write(mainHeader(50 + 4 * contents.size, shapeType, bbox(geoms)))
    shxEntries.result().foreach { case (off, len) =>
      shxD.writeInt(off); shxD.writeInt(len)
    }
    Files.write(dir.resolve(s"$base.shx"), shx.toByteArray)
    // .dbf (dBASE III, all 'C' fields)
    val names = fields.map(f => f.getBytes("UTF-8").take(10))
    val widths = fields.indices.map { i =>
      math.min(254, math.max(1, rows.map(r =>
        Option(r(i)).getOrElse("").getBytes("UTF-8").length).maxOption.getOrElse(1)))
    }
    val recordSize = 1 + widths.sum
    val headerSize = 32 + 32 * fields.size + 1
    val dbf = ByteBuffer.allocate(headerSize + recordSize * rows.size + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    dbf.put(0x03.toByte).put(126.toByte).put(1.toByte).put(1.toByte) // v, YMD
    dbf.putInt(rows.size).putShort(headerSize.toShort).putShort(recordSize.toShort)
    dbf.position(32)
    fields.indices.foreach { i =>
      val d = ByteBuffer.allocate(32)
      d.put(names(i)); d.position(11)
      d.put('C'.toByte); d.position(16)
      d.put(widths(i).toByte)
      dbf.put(d.array())
    }
    dbf.put(0x0D.toByte)
    rows.foreach { r =>
      dbf.put(' '.toByte)
      fields.indices.foreach { i =>
        val v = Option(r(i)).getOrElse("").getBytes("UTF-8").take(widths(i))
        dbf.put(v)
        (v.length until widths(i)).foreach(_ => dbf.put(' '.toByte))
      }
    }
    dbf.put(0x1A.toByte)
    Files.write(dir.resolve(s"$base.dbf"), dbf.array())
    // .prj
    Files.write(dir.resolve(s"$base.prj"), Wgs84Wkt.getBytes("UTF-8"))
  }

  // ---- high-level export (mirrors convert-geojson-shp.py) ----------------

  /** Per route: LineString features → `<outDir>/<sanitized name>/
    * route_lines.*`, Point features → `stops.*`, with the reference's
    * metadata attrs (route_name, color, source). Inputs use the same
    * frame shapes as KmlExport (bounded per-route features; collected at
    * the sink edge like the reference writer).
    */
  def export(routes: DataFrame, wayLines: DataFrame, stops: DataFrame,
             outDir: String): Unit = {
    val lines = wayLines.groupBy(col("relation_id"))
      .agg(sort_array(collect_list(struct(col("feature_idx").as("fi"),
        col("coords").as("cs")))).getField("cs").as("lines"))
    val sts = stops.groupBy(col("relation_id"))
      .agg(sort_array(collect_list(struct(col("feature_idx").as("fi"),
        struct(col("stop_name").as("_1"), col("lon").as("_2"),
          col("lat").as("_3")).as("s")))).getField("s").as("stops"))
    val joined = routes
      .join(lines, Seq("relation_id"), "left")
      .join(sts, Seq("relation_id"), "left")
      .select(col("relation_id"),
        KmlExport.sanitizeFilename(col("route_name")).as("dir_name"),
        col("route_name"), col("color"), col("lines"), col("stops"))
      .collect()
    joined.foreach { r =>
      val dir = Paths.get(outDir, r.getAs[String]("dir_name"))
      val name = r.getAs[String]("route_name")
      val color = r.getAs[String]("color")
      val meta = Seq(name, color, "Transport for Bandung")
      val lineSeqs: Seq[scala.collection.Seq[scala.collection.Seq[Double]]] =
        Option(r.getAs[scala.collection.Seq[
          scala.collection.Seq[scala.collection.Seq[Double]]]]("lines"))
          .map(_.toSeq).getOrElse(Seq.empty)
      if (lineSeqs.nonEmpty) {
        val geoms = lineSeqs.map(part =>
          Geom(Seq(part.map(c => (c(0), c(1))).toSeq)))
        writeShapefile(dir, "route_lines", PolyLineType, geoms,
          Seq("id", "route_name", "color", "source"),
          geoms.indices.map(i => (r.getAs[String]("relation_id") + s"_$i") +: meta))
      }
      val stopSeq: Seq[org.apache.spark.sql.Row] =
        Option(r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("stops"))
          .map(_.toSeq).getOrElse(Seq.empty)
      if (stopSeq.nonEmpty) {
        val geoms = stopSeq.map(s =>
          Geom(Seq(Seq((s.getDouble(1), s.getDouble(2))))))
        writeShapefile(dir, "stops", PointType, geoms,
          Seq("name", "route_name", "color", "source"),
          stopSeq.map(s => Option(s.getString(0)).getOrElse("Stop") +: meta))
      }
    }
  }
}
