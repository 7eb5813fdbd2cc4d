package graft

import java.nio.{ByteBuffer, ByteOrder}
import graft.sources.Shapefile
import graft.model.RegularGrid
import graft.ops.SpatialJoin

/** Shared .shp/.dbf byte-stream builders (public ESRI/dBase layouts). */
object ShapeFixtures {

  /** One Polygon(5) record per ring list; rings closed automatically. */
  def buildShp(polys: Seq[Seq[(Double, Double)]]): Array[Byte] = {
    val recs = polys.zipWithIndex.map { case (ring, i) =>
      val pts = ring :+ ring.head // close the ring
      val contentLen = 4 + 32 + 4 + 4 + 4 + 16 * pts.length
      val r = ByteBuffer.allocate(8 + contentLen)
      r.order(ByteOrder.BIG_ENDIAN)
      r.putInt(i + 1).putInt(contentLen / 2)
      r.order(ByteOrder.LITTLE_ENDIAN)
      r.putInt(5) // Polygon
      val xs = pts.map(_._1); val ys = pts.map(_._2)
      r.putDouble(xs.min).putDouble(ys.min).putDouble(xs.max).putDouble(ys.max)
      r.putInt(1).putInt(pts.length).putInt(0)
      pts.foreach { case (x, y) => r.putDouble(x).putDouble(y) }
      r.array()
    }
    val total = 100 + recs.map(_.length).sum
    val b = ByteBuffer.allocate(total)
    b.order(ByteOrder.BIG_ENDIAN)
    b.putInt(9994)
    b.position(24); b.putInt(total / 2)
    b.order(ByteOrder.LITTLE_ENDIAN)
    b.position(28); b.putInt(1000); b.putInt(5)
    b.position(100)
    recs.foreach(b.put)
    b.array()
  }

  def buildDbf(field: String, values: Seq[String], width: Int): Array[Byte] = {
    val headerSize = 32 + 32 + 1
    val recordSize = 1 + width
    val b = ByteBuffer.allocate(headerSize + values.length * recordSize + 1)
    b.order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x03.toByte).put(24.toByte).put(1.toByte).put(1.toByte)
    b.putInt(values.length)
    b.putShort(headerSize.toShort).putShort(recordSize.toShort)
    b.position(32)
    val name = field.getBytes("ASCII")
    b.put(java.util.Arrays.copyOf(name, 11))
    b.put('C'.toByte)
    b.position(b.position() + 4)
    b.put(width.toByte).put(0.toByte)
    b.position(b.position() + 14)
    b.put(0x0D.toByte)
    values.foreach { v =>
      b.put(' '.toByte)
      b.put(java.util.Arrays.copyOf(v.getBytes("ASCII"), width))
    }
    b.array()
  }

  def writeTmp(suffix: String, bytes: Array[Byte]): String = {
    val f = java.nio.file.Files.createTempFile("shape", suffix)
    java.nio.file.Files.write(f, bytes)
    f.toString
  }
}

/** Runs the fixture byte streams through the reader into the polygon
  * country-mask path. */
class ShapefileSpec extends SparkSpec {

  import ShapeFixtures._

  test("shp + dbf parse: rings, orientation, attributes") {
    // clockwise = outer; counter-clockwise = hole
    val shp = buildShp(Seq(
      Seq((0.0, 0.0), (0.0, 2.0), (2.0, 2.0), (2.0, 0.0)), // CW outer
      Seq((3.0, 0.0), (4.0, 0.0), (4.0, 1.0), (3.0, 1.0)))) // CCW
    val shapes = Shapefile.readShp(shp)
    assert(shapes.length == 2)
    assert(shapes(0).rings.head.xs.length == 4) // closing point dropped
    assert(!shapes(0).rings.head.isHole)
    assert(shapes(1).rings.head.isHole)
    val dbf = buildDbf("ISO_A3", Seq("AAA", "BBB"), 3)
    val (fields, records) = Shapefile.readDbf(dbf)
    assert(fields.map(_.name) == Seq("ISO_A3"))
    assert(records == Seq(Seq("AAA"), Seq("BBB")))
  }

  test("countryPolygons -> polygonMask: real-shapefile country mask") {
    // AAA covers x in [0,2], BBB covers x in [1,4] (overlap on [1,2])
    val shp = buildShp(Seq(
      Seq((0.0, 0.0), (0.0, 4.0), (2.0, 4.0), (2.0, 0.0)),
      Seq((1.0, 0.0), (1.0, 4.0), (4.0, 4.0), (4.0, 0.0))))
    val dbf = buildDbf("ISO_A3", Seq("AAA", "BBB"), 3)
    val countries = Shapefile.countryPolygons(
      spark, writeTmp(".shp", shp), writeTmp(".dbf", dbf))
    val grid = RegularGrid(4, 4, 0.0, 0.0, 1.0, 1.0)
    val mask = SpatialJoin.polygonMask(spark, grid, countries)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // x-major ids: column ix=0 -> AAA only; ix=1 -> tie 1.0/1.0 -> AAA
    // (asc tie-break); ix=2,3 -> BBB only
    assert(mask(0L) == "AAA")
    assert(mask(1L * 4) == "AAA")
    assert(mask(2L * 4) == "BBB")
    assert(mask(3L * 4 + 3) == "BBB")
    assert(mask.size == 16)
  }

  test("committed NE extract parses: outer rings, ISO_A3 attrs, CW orientation") {
    val countries = Shapefile.countryPolygons(
      spark, "fixtures/ne_extract/ne_extract.shp",
      "fixtures/ne_extract/ne_extract.dbf")
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).length).toMap
    assert(countries.keySet == Set("CHE", "AUT", "ITA", "FRA", "LIE"))
    assert(countries("CHE") == 10 && countries("LIE") == 4)
  }

  test("country_tz table: comment preamble skipped, padded cells trimmed") {
    val tz = graft.sources.CountryTz.read(spark, "fixtures/country_tz.csv")
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5)))).toMap
    assert(tz.size == 6)
    assert(tz("CHE") == (("Switzerland", 1, 1, 1, 0)))
    assert(tz("ATL") == (("Atlantic Ocean", 0, 0, 2, 1))) // sea row
  }
}
