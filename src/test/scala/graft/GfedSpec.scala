package graft

import graft.sources.{GfasLoader, GfedLoader, NetcdfClassic}
import graft.sinks.NetcdfWriter
import graft.sinks.NetcdfWriter.WriteVar
import NetcdfClassic.{NcDim, NcDouble, NcFloat}

/** GFED5 monthly-file loader on byte-level fixtures
  * (emiproc/inventories/gfed.py:308-372 semantics). */
class GfedSpec extends SparkSpec {

  private val DaysIn2023 =
    Array(31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)

  private def monthFile(days: Int, set: Map[(Int, Int, Int), Float]): Array[Byte] = {
    val data = new Array[Double](days * 4)
    set.foreach { case ((d, i, j), v) => data(d * 4 + i * 2 + j) = v }
    NetcdfWriter.write(
      dims = Seq(NcDim("time", days), NcDim("lat", 2), NcDim("lon", 2)),
      gatts = Nil,
      vars = Seq(
        WriteVar("lat", Seq("lat"), NcDouble, doubles = Array(10.0, 12.0)),
        WriteVar("lon", Seq("lon"), NcDouble, doubles = Array(100.0, 102.0)),
        WriteVar("CO2", Seq("time", "lat", "lon"), NcFloat, doubles = data)))
  }

  test("12 monthly files: kg/cell annual total + day-of-year series") {
    val dir = java.nio.file.Files.createTempDirectory("gfed")
    (1 to 12).foreach { m =>
      val set: Map[(Int, Int, Int), Float] = m match {
        case 1 => Map((0, 0, 0) -> 3f)
        case 2 => Map((1, 1, 1) -> 1.5f)
        case _ => Map.empty
      }
      java.nio.file.Files.write(
        dir.resolve(f"GFED5_Beta_daily_2023$m%02d.nc"),
        monthFile(DaysIn2023(m - 1), set))
    }
    val inv = GfedLoader.read(spark, dir.toString, 2023, Seq("CO2"))
    assert(inv.grid.nx == 2 && inv.grid.ny == 2)

    val ann = inv.annual.collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(ann.size == 2)
    // cell 0 = (lon0, lat0): 3 g/m2 on one day -> 3e-3 * area kg
    val a0 = GfasLoader.sphericalCellArea(9.0, 11.0, 2.0)
    assert(math.abs(ann(0L) / (3e-3 * a0) - 1.0) < 1e-6)
    // cell 3 = (lon1, lat1)
    val a1 = GfasLoader.sphericalCellArea(11.0, 13.0, 2.0)
    assert(math.abs(ann(3L) / (1.5e-3 * a1) - 1.0) < 1e-6)

    // day-of-year positions: Jan day 0 -> 0; Feb day 1 -> 31 + 1 = 32
    val daily = inv.dailySeries.collect()
      .map(r => (r.getLong(1), r.getInt(2)) -> r.getDouble(3)).toMap
    assert(daily.size == 2)
    assert(daily((0L, 0)) == 3.0)
    assert(math.abs(daily((3L, 32)) - 1.5) < 1e-6)
  }

  test("missing month file / missing substance fail like the reference") {
    val dir = java.nio.file.Files.createTempDirectory("gfedBad")
    intercept[IllegalArgumentException] {
      GfedLoader.read(spark, dir.toString, 2023, Seq("CO2"))
    }
    (1 to 12).foreach { m =>
      java.nio.file.Files.write(
        dir.resolve(f"GFED5_Beta_daily_2023$m%02d.nc"),
        monthFile(DaysIn2023(m - 1), Map.empty))
    }
    intercept[IllegalArgumentException] {
      GfedLoader.read(spark, dir.toString, 2023, Seq("NOPE"))
    }
  }
}
