package graft

import java.nio.ByteBuffer
import graft.sources.{GfasLoader, NetcdfClassic}

/** GFAS-shaped CDF-1 fixture: a year of daily fluxes on a 2×3 lon/lat
  * grid, sparse fires, spherical-area annual conversion. */
class GfasSpec extends SparkSpec {

  import NetcdfClassic._
  import NcFixtures._

  private val nDays = 365
  private val lats = Seq(10.0, 12.0)
  private val lons = Seq(100.0, 102.0, 104.0)

  // fires: cell (lat 0, lon 1) burns 2 kg m-2 s-1 on day 0 and 4 on day 1;
  // cell (lat 1, lon 2) burns 7.5 on day 100
  private def gfasBytes: Array[Byte] = {
    val perDay = lats.length * lons.length
    val data = new Array[Float](nDays * perDay)
    data(0 * perDay + 0 * lons.length + 1) = 2f
    data(1 * perDay + 0 * lons.length + 1) = 4f
    data(100 * perDay + 1 * lons.length + 2) = 7.5f
    build(
      Seq(("valid_time", nDays), ("latitude", lats.length), ("longitude", lons.length)),
      Seq(
        V("latitude", Seq(1), NcDouble, Seq("units" -> "degrees_north"),
          doubles(lats: _*), 8 * lats.length),
        V("longitude", Seq(2), NcDouble, Seq("units" -> "degrees_east"),
          doubles(lons: _*), 8 * lons.length),
        V("co2fire", Seq(0, 1, 2), NcFloat, Nil,
          b => data.foreach(b.putFloat), 4 * data.length)))
  }

  test("GFAS loader: annual mean x SEC_PER_YR x spherical area, sparse series") {
    val path = java.nio.file.Files.createTempFile("gfas", ".nc")
    java.nio.file.Files.write(path, gfasBytes)
    val inv = GfasLoader.read(spark, path.toString)
    assert(inv.grid.nx == 3 && inv.grid.ny == 2 && inv.grid.dx == 2.0)
    val ann = inv.annual.collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // cell (lat0=10, lon1) -> x-major id 1*2+0 = 2
    val a0 = GfasLoader.sphericalCellArea(9.0, 11.0, 2.0)
    val exp0 = (2.0 + 4.0) / 365 * GfasLoader.SecPerYear * a0
    assert(math.abs(ann(2L) / exp0 - 1.0) < 1e-6)
    // cell (lat1=12, lon2) -> id 2*2+1 = 5
    val a1 = GfasLoader.sphericalCellArea(11.0, 13.0, 2.0)
    val exp1 = 7.5 / 365 * GfasLoader.SecPerYear * a1
    assert(math.abs(ann(5L) / exp1 - 1.0) < 1e-6)
    assert(ann.size == 2) // zero cells dropped
    val daily = inv.dailySeries.collect()
      .map(r => (r.getLong(1), r.getInt(2)) -> r.getDouble(3)).toMap
    assert(daily((2L, 0)) == 2.0 && daily((2L, 1)) == 4.0)
    assert(daily((5L, 100)) == 7.5)
    assert(daily.size == 3)
    // substance naming: co2fire -> CO2
    assert(inv.annual.select("substance").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("CO2"))
  }

  test("GFAS loader rejects partial years") {
    val bad = build(
      Seq(("valid_time", 10), ("latitude", 2), ("longitude", 3)),
      Seq(
        V("latitude", Seq(1), NcDouble, Nil, doubles(10.0, 12.0), 16),
        V("longitude", Seq(2), NcDouble, Nil, doubles(100.0, 102.0, 104.0), 24),
        V("co2fire", Seq(0, 1, 2), NcFloat, Nil,
          b => (0 until 60).foreach(_ => b.putFloat(0f)), 240)))
    val path = java.nio.file.Files.createTempFile("gfas", ".nc")
    java.nio.file.Files.write(path, bad)
    intercept[IllegalArgumentException] {
      GfasLoader.read(spark, path.toString)
    }
  }
}
