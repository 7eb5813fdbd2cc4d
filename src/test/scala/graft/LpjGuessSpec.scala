package graft

import graft.sources.{GfasLoader, LpjGuessLoader, NetcdfClassic}
import graft.sinks.NetcdfWriter
import graft.sinks.NetcdfWriter.{WriteVar, textAtt}
import NetcdfClassic.{NcDim, NcDouble, NcFloat}

/** LPJ-GUESS output loader on byte-level fixtures
  * (emiproc/inventories/lpjguess.py:13-132 semantics). */
class LpjGuessSpec extends SparkSpec {

  private def lpjFile(varName: String, data: Array[Double],
      units: String = LpjGuessLoader.ExpectedUnits): Array[Byte] =
    NetcdfWriter.write(
      dims = Seq(NcDim("time", 2), NcDim("latitude", 2), NcDim("longitude", 2)),
      gatts = Nil,
      vars = Seq(
        WriteVar("latitude", Seq("latitude"), NcDouble, doubles = Array(10.0, 12.0)),
        WriteVar("longitude", Seq("longitude"), NcDouble, doubles = Array(100.0, 102.0)),
        WriteVar("time", Seq("time"), NcDouble, doubles = Array(0.0, 1.0)),
        WriteVar(varName, Seq("time", "latitude", "longitude"), NcFloat,
          atts = Seq(textAtt("units", units)), doubles = data)))

  test("varname split -> (substance, category); mg/m2/d -> kg/y; day ratios") {
    // cell (lat0, lon0): 1 mg on day 0, 3 mg on day 1
    val data = new Array[Double](2 * 4)
    data(0) = 1.0; data(4) = 3.0
    val p = java.nio.file.Files.createTempFile("lpj", ".nc")
    java.nio.file.Files.write(p, lpjFile("CH4_wetland_nat", data))
    val inv = LpjGuessLoader.read(spark, Seq(p.toString), 2023)
    assert(inv.grid.nx == 2 && inv.grid.ny == 2)

    val ann = inv.annual.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getDouble(3))
      .toMap
    assert(ann.size == 1)
    val area = GfasLoader.sphericalCellArea(9.0, 11.0, 2.0)
    assert(math.abs(ann((0L, "wetland_nat", "CH4")) / (4e-6 * area) - 1.0) < 1e-6)

    val ratios = inv.dailyRatios.collect()
      .map(r => (r.getLong(2), r.getInt(3)) -> r.getDouble(4)).toMap
    assert(ratios == Map((0L, 0) -> 0.25, (0L, 1) -> 0.75))
  }

  test("wrong units fail the reference's assertion") {
    val p = java.nio.file.Files.createTempFile("lpjBad", ".nc")
    java.nio.file.Files.write(p,
      lpjFile("CH4_wetland", new Array[Double](8), units = "kg m-2 s-1"))
    intercept[IllegalArgumentException] {
      LpjGuessLoader.read(spark, Seq(p.toString), 2023)
    }
  }
}
