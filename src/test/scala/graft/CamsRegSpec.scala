package graft

import graft.sources.{CamsRegLoader, NetcdfClassic}
import graft.sinks.NetcdfWriter
import graft.sinks.NetcdfWriter.{WriteVar, textAtt}
import NetcdfClassic.{NcDim, NcDouble, NcFloat}

/** CAMS_REG_AQ directory loader on byte-level fixtures
  * (emiproc/inventories/cams_reg_aq.py:14-146 semantics). */
class CamsRegSpec extends SparkSpec {

  private val cats = Seq("A_PublicPower", "B_Industry")
  private val catMap = Map("A_PublicPower" -> "A", "B_Industry" -> "B")

  private def camsFile(perCat: Map[String, Array[Double]],
      units: String = "Tg"): Array[Byte] =
    NetcdfWriter.write(
      dims = Seq(NcDim("time", 1), NcDim("lat", 2), NcDim("lon", 2)),
      gatts = Nil,
      vars = Seq(
        WriteVar("lat", Seq("lat"), NcDouble, doubles = Array(40.0, 40.1)),
        WriteVar("lon", Seq("lon"), NcDouble, doubles = Array(5.0, 5.1)),
        WriteVar("time", Seq("time"), NcDouble, doubles = Array(0.0))) ++
        cats.map(c => WriteVar(c, Seq("time", "lat", "lon"), NcFloat,
          atts = Seq(textAtt("units", units)),
          doubles = perCat.getOrElse(c, new Array[Double](4)))))

  private def name(sub: String) =
    s"CAMS-REG-ANT_EUR_0.05x0.1_anthro_${sub}_v6.1-Ref2_yearly_2022.nc"

  test("directory scan: filename substance capture, Tg->kg, category mapping") {
    val dir = java.nio.file.Files.createTempDirectory("cams")
    java.nio.file.Files.write(dir.resolve(name("nox")),
      camsFile(Map("A_PublicPower" -> Array(0.5, 0, 0, 0))))
    java.nio.file.Files.write(dir.resolve(name("ch4")),
      camsFile(Map("B_Industry" -> Array(0, 0, 0, 0.25))))
    java.nio.file.Files.write(dir.resolve("unrelated.nc"), Array[Byte](1, 2))

    val (grid, inv) = CamsRegLoader.read(spark, dir.toString,
      categoriesMapping = catMap)
    assert(grid.nx == 2 && grid.ny == 2)
    assert(math.abs(grid.dx - 0.1) < 1e-9)
    val rows = inv.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getDouble(3))
      .toMap
    // (lat0, lon0) -> cell 0; 0.5 Tg -> 0.5e9 kg
    assert(rows((0L, "A", "NOx")) == 0.5e9)
    // (lat1, lon1) -> cell j=1*2 + i=1 = 3
    assert(rows((3L, "B", "CH4")) == 0.25e9)
    assert(rows.size == 2)
  }

  test("errors match the reference: bad units, missing category, unmapped substance") {
    val dir = java.nio.file.Files.createTempDirectory("camsBad")
    java.nio.file.Files.write(dir.resolve(name("nox")),
      camsFile(Map.empty, units = "kg"))
    intercept[IllegalArgumentException] {
      CamsRegLoader.read(spark, dir.toString, categoriesMapping = catMap)
    }

    val dir2 = java.nio.file.Files.createTempDirectory("camsBad2")
    java.nio.file.Files.write(dir2.resolve(name("nox")), camsFile(Map.empty))
    intercept[IllegalArgumentException] { // category var absent from file
      CamsRegLoader.read(spark, dir2.toString,
        categoriesMapping = Map("Z_Missing" -> "Z"))
    }
    intercept[IllegalArgumentException] { // substance not in the mapping
      CamsRegLoader.read(spark, dir2.toString,
        substancesMapping = Map.empty, categoriesMapping = catMap)
    }
    intercept[IllegalArgumentException] { // empty dir: no files match
      CamsRegLoader.read(spark,
        java.nio.file.Files.createTempDirectory("camsEmpty").toString)
    }
  }
}
