package graft

import java.nio.{ByteBuffer, ByteOrder}
import graft.sources.{NetcdfClassic, TnoLoader}

/** Shared generic CDF-1 assembler for source-loader specs. */
object NcFixtures {

  import NetcdfClassic._

  private def pad4(n: Int): Int = (n + 3) & ~3

  case class V(
      name: String, dimIds: Seq[Int], ncType: Int,
      atts: Seq[(String, String)], payload: ByteBuffer => Unit, payloadLen: Int)

  /** Two-pass CDF-1 assembly with computed data offsets. */
  def build(dims: Seq[(String, Int)], vars: Seq[V]): Array[Byte] = {
    def header(begins: Seq[Long]): Array[Byte] = {
      val b = ByteBuffer.allocate(1 << 16).order(ByteOrder.BIG_ENDIAN)
      def name(s: String): Unit = {
        b.putInt(s.length); b.put(s.getBytes("UTF-8"))
        (s.length until pad4(s.length)).foreach(_ => b.put(0.toByte))
      }
      b.put('C'.toByte).put('D'.toByte).put('F'.toByte).put(1.toByte)
      b.putInt(0)
      b.putInt(0x0A); b.putInt(dims.length)
      dims.foreach { case (n, len) => name(n); b.putInt(len) }
      b.putInt(0); b.putInt(0) // no global atts
      b.putInt(0x0B); b.putInt(vars.length)
      vars.zip(begins).foreach { case (v, begin) =>
        name(v.name); b.putInt(v.dimIds.length); v.dimIds.foreach(b.putInt)
        if (v.atts.isEmpty) { b.putInt(0); b.putInt(0) }
        else {
          b.putInt(0x0C); b.putInt(v.atts.length)
          v.atts.foreach { case (an, av) =>
            name(an); b.putInt(NcChar); b.putInt(av.length)
            b.put(av.getBytes("UTF-8"))
            (av.length until pad4(av.length)).foreach(_ => b.put(0.toByte))
          }
        }
        b.putInt(v.ncType); b.putInt(pad4(v.payloadLen)); b.putInt(begin.toInt)
      }
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    val hlen = header(vars.map(_ => 0L)).length.toLong
    val begins = vars.scanLeft(hlen)((acc, v) => acc + pad4(v.payloadLen)).init
    val h = header(begins)
    val total = ByteBuffer.allocate(
      h.length + vars.map(v => pad4(v.payloadLen)).sum)
      .order(ByteOrder.BIG_ENDIAN)
    total.put(h)
    vars.foreach { v =>
      val p = total.position()
      v.payload(total)
      total.position(p + pad4(v.payloadLen))
    }
    total.array()
  }

  def doubles(vs: Double*)(b: ByteBuffer): Unit = vs.foreach(b.putDouble)
  def ints(vs: Int*)(b: ByteBuffer): Unit = vs.foreach(b.putInt)
  def floats(vs: Float*)(b: ByteBuffer): Unit = vs.foreach(b.putFloat)
  def chars(s: String)(b: ByteBuffer): Unit = b.put(s.getBytes("UTF-8"))
}

/** Assembles a TNO-shaped CDF-1 file (source dimension, 1-based indexes,
  * area/point split, substance vars tagged by long_name) and loads it. */
class TnoSpec extends SparkSpec {

  import NetcdfClassic._
  import NcFixtures._

  private def tnoBytes: Array[Byte] = {
    // dims: 0 lon(3), 1 lat(2), 2 source(4), 3 str3(3), 4 cat(2),
    //       5 type(2), 6 str1(1)
    val dims = Seq(("lon", 3), ("lat", 2), ("source", 4), ("str3", 3),
      ("cat", 2), ("type", 2), ("str1", 1))
    val emiAtt = Seq("long_name" -> "emission of substance")
    build(dims, Seq(
      V("longitude", Seq(0), NcDouble, Seq("units" -> "degrees_east"),
        doubles(100.0, 100.5, 101.0), 24),
      V("latitude", Seq(1), NcDouble, Seq("units" -> "degrees_north"),
        doubles(10.0, 12.0), 16),
      V("emis_cat_code", Seq(4, 3), NcChar, Nil, chars("A  B  "), 6),
      V("source_type_code", Seq(5, 6), NcChar, Nil, chars("ap"), 2),
      V("longitude_index", Seq(2), NcInt, Nil, ints(1, 2, 3, 1), 16),
      V("latitude_index", Seq(2), NcInt, Nil, ints(1, 1, 2, 1), 16),
      V("source_type_index", Seq(2), NcInt, Nil, ints(1, 1, 1, 2), 16),
      V("emission_category_index", Seq(2), NcInt, Nil, ints(1, 2, 1, 1), 16),
      V("longitude_source", Seq(2), NcDouble, Nil,
        doubles(0, 0, 0, 100.7), 32),
      V("latitude_source", Seq(2), NcDouble, Nil,
        doubles(0, 0, 0, 11.3), 32),
      V("co2_ff", Seq(2), NcFloat, emiAtt, floats(1f, 2f, 3f, 4f), 16),
      V("co2_bf", Seq(2), NcFloat, emiAtt, floats(10f, 20f, 30f, 40f), 16),
      V("ch4", Seq(2), NcFloat, emiAtt, floats(0.5f, 0f, 0f, 0.25f), 16)))
  }

  test("TNO loader: grid, 1-based indexes, area/point split, substance merge") {
    val path = java.nio.file.Files.createTempFile("tno", ".nc")
    java.nio.file.Files.write(path, tnoBytes)
    val inv = TnoLoader.read(spark, path.toString,
      Map("co2_ff" -> "CO2", "co2_bf" -> "CO2", "ch4" -> "CH4"))
    assert(inv.grid.nx == 3 && inv.grid.ny == 2)
    val area = inv.area.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getDouble(3)).toMap
    // source 0: cell (1-1)*2+(1-1)=0, cat A, CO2 = 1+10 = 11, CH4 = 0.5
    assert(area((0L, "A", "CO2")) == 11.0)
    assert(area((0L, "A", "CH4")) == 0.5)
    // source 1: cell (2-1)*2+(1-1)=2, cat B, CO2 = 22 (CH4 zero dropped)
    assert(area((2L, "B", "CO2")) == 22.0)
    assert(!area.contains((2L, "B", "CH4")))
    // source 2: cell (3-1)*2+(2-1)=5, cat A, CO2 = 33
    assert(area((5L, "A", "CO2")) == 33.0)
    assert(area.size == 4)
    // source 3 is the point source at (100.7, 11.3), cat A
    val pts = inv.points.collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getString(2), r.getString(3)) -> r.getDouble(4)).toMap
    assert(pts((100.7, 11.3, "A", "CO2")) == 44.0)
    assert(pts((100.7, 11.3, "A", "CH4")) == 0.25)
    assert(pts.size == 2)
  }

  test("TNO loader: the SAME inventory from a netCDF-4/HDF5 container") {
    import Hdf5Fixtures.{AStr, Group => H5G, chars => h5chars, f32 => h5f32, f64 => h5f64, i32 => h5i32}
    val file = Hdf5Fixtures.build(H5G(Seq(
      "longitude" -> h5f64(Seq(3), Seq(100.0, 100.5, 101.0)).copy(
        attrs = Seq("units" -> AStr("degrees_east"))),
      "latitude" -> h5f64(Seq(2), Seq(10.0, 12.0)).copy(
        attrs = Seq("units" -> AStr("degrees_north"))),
      "emis_cat_code" -> h5chars(3, Seq("A", "B")),
      "source_type_code" -> h5chars(1, Seq("a", "p")),
      "longitude_index" -> h5i32(Seq(4), Seq(1, 2, 3, 1)),
      "latitude_index" -> h5i32(Seq(4), Seq(1, 1, 2, 1)),
      "source_type_index" -> h5i32(Seq(4), Seq(1, 1, 1, 2)),
      "emission_category_index" -> h5i32(Seq(4), Seq(1, 2, 1, 1)),
      "longitude_source" -> h5f64(Seq(4), Seq(0, 0, 0, 100.7)),
      "latitude_source" -> h5f64(Seq(4), Seq(0, 0, 0, 11.3)),
      "co2_ff" -> h5f32(Seq(4), Seq(1f, 2f, 3f, 4f)).copy(
        attrs = Seq("long_name" -> AStr("emission of substance"))),
      "co2_bf" -> h5f32(Seq(4), Seq(10f, 20f, 30f, 40f)).copy(
        attrs = Seq("long_name" -> AStr("emission of substance"))),
      "ch4" -> h5f32(Seq(4), Seq(0.5f, 0f, 0f, 0.25f)).copy(
        attrs = Seq("long_name" -> AStr("emission of substance"))))))
    val path = java.nio.file.Files.createTempFile("tno", ".h5")
    java.nio.file.Files.write(path, file)
    val inv = TnoLoader.read(spark, path.toString,
      Map("co2_ff" -> "CO2", "co2_bf" -> "CO2", "ch4" -> "CH4"))
    val area = inv.area.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getDouble(3)).toMap
    assert(area == Map(
      (0L, "A", "CO2") -> 11.0, (0L, "A", "CH4") -> 0.5,
      (2L, "B", "CO2") -> 22.0, (5L, "A", "CO2") -> 33.0))
    val pts = inv.points.collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getString(2), r.getString(3)) -> r.getDouble(4)).toMap
    assert(pts == Map(
      (100.7, 11.3, "A", "CO2") -> 44.0, (100.7, 11.3, "A", "CH4") -> 0.25))
  }

  test("TNO loader rejects mappings naming substances absent from the file") {
    val path = java.nio.file.Files.createTempFile("tno", ".nc")
    java.nio.file.Files.write(path, tnoBytes)
    intercept[IllegalArgumentException] {
      TnoLoader.read(spark, path.toString, Map("nox" -> "NOx"))
    }
  }
}
