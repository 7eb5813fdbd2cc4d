package graft

import org.apache.spark.sql.functions._
import graft.sources.{FileGdb, MapLuft}
import graft.sources.FileGdb._
import GdbFixtures._

/** MapLuftZurich loader over FileGDB fixtures
  * (emiproc/inventories/zurich/__init__.py:18-117 semantics). */
class MapLuftSpec extends SparkSpec {

  private val pointFields = Seq(
    FField("OBJECTID", TObjectId),
    FField("Emission_CO2", TFloat64, nullable = true),
    FField("Emission_Benzol", TFloat64, nullable = true),
    FField("Other_Attr", TFloat64, nullable = true),
    FField("SHAPE", TGeometry, nullable = true))

  test("substance selection, Benzol rename, no-substance layers skipped") {
    val dir = java.nio.file.Files.createTempDirectory("ml").resolve("z.gdb")
    buildGdb(dir, Seq(
      ("c2201_Heating", pointFields, Seq(
        Seq(FNull, FDouble(100.0), FDouble(1.5), FDouble(9.9),
          FShape(1, Seq(Seq((5.0, 5.0))))))),
      ("c9999_NoEmissions", Seq(
        FField("OBJECTID", TObjectId),
        FField("Other_Attr", TFloat64, nullable = true),
        FField("SHAPE", TGeometry, nullable = true)), Seq(
        Seq(FNull, FDouble(1.0), FShape(1, Seq(Seq((0.0, 0.0)))))))))
    val gdfs = MapLuft.read(spark, dir.toString)
    assert(gdfs.keySet == Set("c2201_Heating")) // no-substance layer skipped
    val row = gdfs("c2201_Heating").collect()(0)
    assert(row.getAs[Double]("CO2") == 100.0)
    assert(row.getAs[Double]("benzene") == 1.5) // Emission_Benzol renamed
    assert(!gdfs("c2201_Heating").columns.contains("Other_Attr"))
  }

  test("josefstrasse KHKW point removal only in its category with the flag") {
    val dir = java.nio.file.Files.createTempDirectory("ml2").resolve("z.gdb")
    val rows = Seq(
      Seq(FNull, FDouble(10.0), FNull, FNull,
        FShape(1, Seq(Seq(MapLuft.JosefstrassePoint)))),
      Seq(FNull, FDouble(20.0), FNull, FNull,
        FShape(1, Seq(Seq((2681000.0, 1248000.0))))))
    buildGdb(dir, Seq(
      (MapLuft.JosefstrasseCategory, pointFields, rows),
      ("c2202_Other", pointFields, rows)))
    val without = MapLuft.read(spark, dir.toString, removeJosefstrasseKhkw = true)
    assert(without(MapLuft.JosefstrasseCategory).count() == 1)
    assert(without(MapLuft.JosefstrasseCategory)
      .collect()(0).getAs[Double]("CO2") == 20.0)
    assert(without("c2202_Other").count() == 2) // other categories untouched
    val kept = MapLuft.read(spark, dir.toString)
    assert(kept(MapLuft.JosefstrasseCategory).count() == 2)
  }

  test("line layers buffer into square-cap polygons (10 m half-width)") {
    val dir = java.nio.file.Files.createTempDirectory("ml3").resolve("z.gdb")
    buildGdb(dir, Seq(
      ("c1301_Traffic", pointFields, Seq(
        Seq(FNull, FDouble(60.0), FNull, FNull,
          FShape(3, Seq(Seq((0.0, 0.0), (100.0, 0.0)))))))))
    val gdfs = MapLuft.read(spark, dir.toString)
    val out = gdfs("c1301_Traffic").collect()
    assert(out.length == 1) // one segment
    val r = out(0)
    val xs = r.getSeq[Double](r.fieldIndex("xs"))
    val ys = r.getSeq[Double](r.fieldIndex("ys"))
    // square cap: extends 10 beyond ends, half-width 10
    assert(xs.toSet == Set(-10.0, 110.0))
    assert(ys.toSet == Set(-10.0, 10.0))
    assert(r.getAs[Double]("CO2") == 60.0) // attribute carried through
    // conversion off: raw polyline survives
    val raw = MapLuft.read(spark, dir.toString, convertLinesToPolygons = false)
    assert(raw("c1301_Traffic").collect()(0).getAs[Int]("geom_type") == 3)
  }
}
