package graft

import java.nio.{ByteBuffer, ByteOrder}
import graft.sources.{NetcdfClassic, NetcdfRaster, RasterTable}

/** Builds a real CDF-1 byte stream (the public Unidata classic layout)
  * and reads it back through the pure-JVM parser + CF raster layer. */
class NetcdfSpec extends SparkSpec {

  import NetcdfClassic._

  private def pad4(n: Int): Int = (n + 3) & ~3

  private class Builder(version: Int) {
    val b: ByteBuffer = ByteBuffer.allocate(1 << 16).order(ByteOrder.BIG_ENDIAN)
    def putName(s: String): Unit = {
      b.putInt(s.length); b.put(s.getBytes("UTF-8"))
      (s.length until pad4(s.length)).foreach(_ => b.put(0.toByte))
    }
    def putCharAtt(name: String, v: String): Unit = {
      putName(name); b.putInt(NcChar); b.putInt(v.length)
      b.put(v.getBytes("UTF-8"))
      (v.length until pad4(v.length)).foreach(_ => b.put(0.toByte))
    }
    def putDoubleAtt(name: String, v: Double): Unit = {
      putName(name); b.putInt(NcDouble); b.putInt(1); b.putDouble(v)
    }
    def putBegin(off: Long): Unit =
      if (version == 1) b.putInt(off.toInt) else b.putLong(off)
    def bytes: Array[Byte] = java.util.Arrays.copyOf(b.array(), b.position())
  }

  /** lat(2)=[10,12] deg_north, lon(3)=[100,100.5,101] deg_east,
    * emis(lat,lon) float with scale_factor=2 and _FillValue=-999. */
  private def buildFile(version: Int): Array[Byte] = {
    def assemble(beginLat: Long, beginLon: Long, beginEmis: Long): Builder = {
      val w = new Builder(version)
      w.b.put('C'.toByte).put('D'.toByte).put('F'.toByte).put(version.toByte)
      w.b.putInt(0) // numrecs
      w.b.putInt(0x0A); w.b.putInt(2) // dim_list
      w.putName("lat"); w.b.putInt(2)
      w.putName("lon"); w.b.putInt(3)
      w.b.putInt(0x0C); w.b.putInt(1) // gatt_list
      w.putCharAtt("title", "graft test")
      w.b.putInt(0x0B); w.b.putInt(3) // var_list
      // lat
      w.putName("lat"); w.b.putInt(1); w.b.putInt(0)
      w.b.putInt(0x0C); w.b.putInt(1); w.putCharAtt("units", "degrees_north")
      w.b.putInt(NcDouble); w.b.putInt(16); w.putBegin(beginLat)
      // lon
      w.putName("lon"); w.b.putInt(1); w.b.putInt(1)
      w.b.putInt(0x0C); w.b.putInt(1); w.putCharAtt("units", "degrees_east")
      w.b.putInt(NcDouble); w.b.putInt(24); w.putBegin(beginLon)
      // emis(lat, lon)
      w.putName("emis"); w.b.putInt(2); w.b.putInt(0); w.b.putInt(1)
      w.b.putInt(0x0C); w.b.putInt(2)
      w.putDoubleAtt("scale_factor", 2.0)
      w.putDoubleAtt("_FillValue", -999.0)
      w.b.putInt(NcFloat); w.b.putInt(24); w.putBegin(beginEmis)
      w
    }
    val headerLen = assemble(0, 0, 0).bytes.length.toLong
    val w = assemble(headerLen, headerLen + 16, headerLen + 40)
    w.b.putDouble(10.0); w.b.putDouble(12.0) // lat
    w.b.putDouble(100.0); w.b.putDouble(100.5); w.b.putDouble(101.0) // lon
    Seq(1f, 2f, 3f, 4f, -999f, 6f).foreach(w.b.putFloat)
    w.bytes
  }

  test("CDF-1 header parses: dims, global atts, var atts, offsets") {
    val f = readHeader(buildFile(1))
    assert(f.version == 1)
    assert(f.dims == Seq(NcDim("lat", 2), NcDim("lon", 3)))
    assert(f.gatts.head.name == "title" && f.gatts.head.text == "graft test")
    val emis = f.variable("emis")
    assert(emis.dimIds == Seq(0, 1) && emis.ncType == NcFloat)
    assert(f.variable("lat").atts.head.text == "degrees_north")
  }

  test("CDF-2 (64-bit offsets) parses identically") {
    val f = readHeader(buildFile(2))
    assert(f.version == 2)
    assert(f.dims.map(_.name) == Seq("lat", "lon"))
    val d = readVarDoubles(buildFile(2), f, "lon")
    assert(d.toSeq == Seq(100.0, 100.5, 101.0))
  }

  test("readVarDoubles applies scale_factor and maps _FillValue to NaN") {
    val bytes = buildFile(1)
    val f = readHeader(bytes)
    val d = readVarDoubles(bytes, f, "emis")
    assert(d(0) == 2.0 && d(1) == 4.0 && d(2) == 6.0 && d(3) == 8.0)
    assert(d(4).isNaN)
    assert(d(5) == 12.0)
  }

  test("NetcdfRaster.read: grid from coords, NaN dropped, inventory compose") {
    val path = java.nio.file.Files.createTempFile("graft", ".nc")
    java.nio.file.Files.write(path, buildFile(1))
    val (grid, df) = NetcdfRaster.read(spark, path.toString)
    assert(grid.nx == 3 && grid.ny == 2)
    assert(grid.dx == 0.5 && grid.dy == 2.0)
    assert(grid.xmin == 99.75 && grid.ymin == 9.0)
    val rows = df.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert(rows.size == 5) // fill cell dropped
    assert(rows((0, 0)) == 2.0 && rows((2, 1)) == 12.0)
    assert(!rows.contains((1, 1)))
    // through the existing converter semantics: x-major cell ids
    val inv = RasterTable.toInventory(spark, df, grid,
      Seq(("emis", "cat", "CO2")), fluxUnits = false)
    val m = inv.collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(m(0L) == 2.0) // lon 0, lat 0
    assert(m(2L * 2 + 1) == 12.0) // lon 2, lat 1
  }

  test("regularAxis rejects irregular spacing") {
    intercept[IllegalArgumentException] {
      NetcdfRaster.regularAxis(Array(0.0, 1.0, 2.5))
    }
  }
}
