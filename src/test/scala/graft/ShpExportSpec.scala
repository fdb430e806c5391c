package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import graft.gtfs.ShpExport

/** K4: the pure-Scala shapefile writer must emit structurally valid ESRI
  * files — the spec re-parses the binary (headers, record coords, dBASE
  * layout) rather than trusting the writer's own code paths.
  */
class ShpExportSpec extends SparkTestBase {
  import spark.implicits._

  private def bbuf(p: java.nio.file.Path) =
    ByteBuffer.wrap(Files.readAllBytes(p))

  test("export writes parseable point and polyline shapefiles per route") {
    val out = Files.createTempDirectory("shp-test").toString
    val routes = Seq(("r1", "01A: Abdul Muis → Cicaheum", "#2D398B"))
      .toDF("relation_id", "route_name", "color")
    val ways = Seq(("r1", 0, Seq(Seq(107.6, -6.9), Seq(107.61, -6.91), Seq(107.62, -6.9))))
      .toDF("relation_id", "feature_idx", "coords")
    val stops = Seq(("r1", 0, "Stop A", 107.6, -6.9), ("r1", 1, "Stop B", 107.62, -6.9))
      .toDF("relation_id", "feature_idx", "stop_name", "lon", "lat")
    ShpExport.export(routes, ways, stops, out)

    val dir = Paths.get(out, "01A_ Abdul Muis _ Cicaheum")
    for (base <- Seq("route_lines", "stops"); ext <- Seq("shp", "shx", "dbf", "prj"))
      assert(Files.exists(dir.resolve(s"$base.$ext")), s"$base.$ext missing")

    // ---- stops.shp: header + two point records
    val shp = bbuf(dir.resolve("stops.shp"))
    shp.order(ByteOrder.BIG_ENDIAN)
    assert(shp.getInt(0) == 9994)
    val fileWords = shp.getInt(24)
    assert(fileWords * 2 == Files.size(dir.resolve("stops.shp")))
    shp.order(ByteOrder.LITTLE_ENDIAN)
    assert(shp.getInt(32) == 1) // point type
    assert(shp.getDouble(36) == 107.6 && shp.getDouble(44) == -6.9) // bbox min
    // record 1: BE header at 100, then LE point
    shp.order(ByteOrder.BIG_ENDIAN)
    assert(shp.getInt(100) == 1 && shp.getInt(104) == 10) // 20 bytes content
    shp.order(ByteOrder.LITTLE_ENDIAN)
    assert(shp.getInt(108) == 1)
    assert(shp.getDouble(112) == 107.6 && shp.getDouble(120) == -6.9)

    // ---- stops.shx: 100-byte header + 8 bytes per record
    assert(Files.size(dir.resolve("stops.shx")) == 100 + 8 * 2)

    // ---- stops.dbf: 2 records, 4 'C' fields
    val dbf = bbuf(dir.resolve("stops.dbf"))
    dbf.order(ByteOrder.LITTLE_ENDIAN)
    assert(dbf.get(0) == 0x03)
    assert(dbf.getInt(4) == 2)
    val headerSize = dbf.getShort(8)
    assert(headerSize == 32 + 32 * 4 + 1)
    val recordSize = dbf.getShort(10)
    val fname = new Array[Byte](4); dbf.position(32); dbf.get(fname)
    assert(new String(fname, "UTF-8") == "name")
    assert(dbf.get(32 + 11) == 'C')
    // first record starts with the deletion flag then "Stop A"
    val rec = new Array[Byte](recordSize); dbf.position(headerSize); dbf.get(rec)
    assert(rec(0) == ' ')
    assert(new String(rec, 1, 6, "UTF-8") == "Stop A")
    assert(Files.size(dir.resolve("stops.dbf")) == headerSize + recordSize * 2 + 1)

    // ---- route_lines.shp: one polyline record with 3 points
    val lshp = bbuf(dir.resolve("route_lines.shp"))
    lshp.order(ByteOrder.LITTLE_ENDIAN)
    assert(lshp.getInt(32) == 3) // polyline type
    assert(lshp.getInt(108) == 3) // record shape type
    assert(lshp.getInt(144) == 1 && lshp.getInt(148) == 3) // 1 part, 3 points
    assert(lshp.getInt(152) == 0) // part offset
    assert(lshp.getDouble(156) == 107.6 && lshp.getDouble(164) == -6.9)

    // ---- prj pins WGS84
    val prj = new String(Files.readAllBytes(dir.resolve("stops.prj")), "UTF-8")
    assert(prj.contains("WGS_1984"))
  }

  test("dbf field names truncate to 10 bytes and widths fit the data") {
    val dir = Files.createTempDirectory("shp-dbf")
    ShpExport.writeShapefile(dir, "t", 1,
      Seq(ShpExport.Geom(Seq(Seq((1.0, 2.0))))),
      Seq("a_very_long_field_name"), Seq(Seq("xyz")))
    val dbf = ByteBuffer.wrap(Files.readAllBytes(dir.resolve("t.dbf")))
      .order(ByteOrder.LITTLE_ENDIAN)
    val fname = new Array[Byte](11); dbf.position(32); dbf.get(fname)
    assert(new String(fname.takeWhile(_ != 0), "UTF-8") == "a_very_lon")
    assert(dbf.get(32 + 16) == 3) // width fitted to "xyz"
  }
}
