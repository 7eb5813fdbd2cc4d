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

  // ---- GFED4 over the pure-JVM HDF5 reader -----------------------------

  test("GFED4: DM × partitioning × area, category prefix stripped") {
    val f = java.nio.file.Files.createTempFile("gfed4", ".hdf5")
    java.nio.file.Files.write(f, Hdf5Fixtures.gfed4Fixture())
    val inv = GfedLoader.readGfed4(spark, f.toString, "DM")

    assert(inv.grid.nx == 2 && inv.grid.ny == 2)
    assert(inv.grid.dx == 2.0 && inv.grid.dy == 2.0)

    // hand products over the fixture (cellId = j*nLat + i, lon-major):
    // m1 DM=[[1,2],[3,4]], SAVA=[[.5,1],[.25,0]], TEMF=[[.5,0],[.75,1]]
    // m2 DM=[[5,0],[0,8]], SAVA=[[1,0],[0,.5]], TEMF=[[0,0],[0,.5]]
    // area=[[10,10],[20,20]]
    val ann = inv.annual.collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(ann((0L, "SAVA")) == 1 * 0.5 * 10 + 5 * 1.0 * 10) // 55
    assert(ann((2L, "SAVA")) == 2 * 1.0 * 10) // 20
    assert(ann((1L, "SAVA")) == 3 * 0.25 * 20) // 15
    assert(ann((3L, "SAVA")) == 8 * 0.5 * 20) // 80
    assert(ann((0L, "TEMF")) == 1 * 0.5 * 10) // 5
    assert(ann((1L, "TEMF")) == 3 * 0.75 * 20) // 45
    assert(ann((3L, "TEMF")) == 4 * 1.0 * 20 + 8 * 0.5 * 20) // 160
    assert(!ann.contains((2L, "TEMF"))) // zero product drops
    assert(inv.annual.select("substance").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("DM"))

    val mon = inv.monthly.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)) -> r.getDouble(3)).toMap
    assert(mon((0L, "SAVA", 1)) == 5.0 && mon((0L, "SAVA", 2)) == 50.0)
    assert(mon((3L, "TEMF", 1)) == 80.0 && mon((3L, "TEMF", 2)) == 80.0)
  }

  test("GFED4: day-of-year ratios normalize per cell; 96-slot diurnal") {
    val f = java.nio.file.Files.createTempFile("gfed4", ".hdf5")
    java.nio.file.Files.write(f, Hdf5Fixtures.gfed4Fixture())
    val inv = GfedLoader.readGfed4(spark, f.toString)

    // cell0 day fractions: m1 d1=0.25, d2=0.75; m2 d1=1 -> /2
    val doy = inv.dayOfYear.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(doy((0L, 1)) == 0.125 && doy((0L, 2)) == 0.375 && doy((0L, 3)) == 0.5)
    assert(doy((2L, 1)) == 1.0) // single emitting day -> ratio 1
    assert(doy((1L, 2)) == 1.0)
    assert(doy((3L, 3)) == 1.0)
    // per-cell ratios sum to 1 across the year
    val sums = doy.toSeq.groupBy(_._1._1).map { case (c, xs) => c -> xs.map(_._2).sum }
    sums.values.foreach(s => assert(math.abs(s - 1.0) < 1e-12))

    // diurnal: cell0 month-1 slots 0 and 7 carry 0.5 each
    val di = inv.diurnal.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(di == Map((0L, 0) -> 0.5, (0L, 7) -> 0.5))
  }

  test("GFED4 profiles drive the composite machinery end-to-end " +
    "(DayOfYear × Hour3OfDayPerMonth, the reference's profile set)") {
    import org.apache.spark.sql.functions.{col, lit}
    val f = java.nio.file.Files.createTempFile("gfed4", ".hdf5")
    java.nio.file.Files.write(f, Hdf5Fixtures.gfed4Fixture())
    val inv = GfedLoader.readGfed4(spark, f.toString)
    // cell 0's series, positions shifted to the kind's 0-based cycle
    val doy = inv.dayOfYear.where(col("cell_id") === 0)
      .select((col("doy") - 1).as("pos"), col("ratio"))
    val diurnal = inv.diurnal.where(col("cell_id") === 0)
      .select(col("slot").as("pos"), col("ratio"))
    val sf = graft.profiles.Temporal.compositeScalingFactors(
      spark, "2023-01-01 00:00:00", 24,
      Seq("day_of_year" -> doy, "hour3_of_day_per_month" -> diurnal))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // Jan 1 = doy pos 0: ratio 0.125 × 365; diurnal slots 0 and 7 carry
    // 0.5 × 96 = 48, missing slots contribute 1.0
    val day = 0.125 * 365
    assert(math.abs(sf(0) - day * 48) < 1e-9)
    assert(math.abs(sf(2) - day * 48) < 1e-9)
    assert(math.abs(sf(3) - day) < 1e-9) // slot 1 absent -> factor 1
    assert(math.abs(sf(12) - day) < 1e-9)
    assert(math.abs(sf(21) - day * 48) < 1e-9)
    assert(math.abs(sf(23) - day * 48) < 1e-9)
  }

  test("GFED4: committed fixture file parses identically") {
    val path = "/root/repo/fixtures/gfed4.hdf5"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
    val inv = GfedLoader.readGfed4(spark, path)
    assert(inv.annual.count() == 7)
    assert(inv.monthly.count() == 9)
  }
}
