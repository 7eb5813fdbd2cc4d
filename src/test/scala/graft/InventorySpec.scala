package graft

import org.apache.spark.sql.functions._
import graft.model.{Inventory, RegularGrid}
import graft.ops.{Grouping, InventoryOps}
import graft.sources.RasterTable
import graft.sinks.IconExport
import graft.ops.HumanRespiration
import graft.functions.Units

class InventorySpec extends SparkSpec {

  test("inventory facade: remap folds point sources, keeps lineage") {
    val src = RegularGrid(4, 4, 0.0, 0.0, 1.0, 1.0)
    val dst = RegularGrid(2, 2, 0.0, 0.0, 2.0, 2.0)
    val sources = spark.createDataFrame(Seq(
      (1L, "pt", "point", "CO2", 8.0, 2.0, 2.0))) // center corner -> 4 cells
      .toDF("source_id", "category", "geom_kind", "substance", "value", "x", "y")
    val inv = Inventory(
      emissions = basicInv, // cells 0..4 on the 4x4 grid
      sources = Some(sources),
      grid = Some(src))
    val out = InventoryOps.remap(spark, inv, dst)
    assert(out.grid.contains(dst))
    assert(out.history.exists(_.contains("remapped")))
    // mass conserved: emissions total + point total
    val t0 = basicInv.agg(sum("value")).collect()(0).getDouble(0) + 8.0
    val t1 = out.emissions.agg(sum("value")).collect()(0).getDouble(0)
    assert(math.abs(t0 - t1) < 1e-9)
  }

  test("raster table ingestion converts flux to kg/y/cell with mapping") {
    val grid = RegularGrid(2, 2, 0.0, 0.0, 1.0, 1.0)
    val raster = spark.createDataFrame(Seq(
      (0, 0, "v0", 2.0), (1, 1, "v1", 3.0), (0, 1, "vX", 9.0)))
      .toDF("lon_idx", "lat_idx", "variable", "flux")
    val out = RasterTable.toInventory(spark, raster, grid,
      Seq(("v0", "A", "CO2"), ("v1", "B", "CH4")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getDouble(3))
      .toMap
    assert(out.size == 2) // unmapped variable dropped
    assert(out((0L, "A", "CO2")) == 2.0 * RasterTable.SecPerYear)
    assert(out((3L, "B", "CH4")) == 3.0 * RasterTable.SecPerYear)
  }

  test("icon tz roll rotates cyclic positions") {
    val p = spark.createDataFrame(Seq((1, 0, 0.5), (1, 23, 0.5)))
      .toDF("profile_id", "pos", "ratio")
    val out = IconExport.tzRoll(p, 7).collect()
      .map(r => r.getInt(1)).toSet
    assert(out == Set(7, 6)) // 0+7, (23+7)%24=6
  }

  test("people_to_emissions: population x factor x time ratio") {
    val pop = spark.createDataFrame(Seq(
      (0L, "resident", 100), (0L, "worker", 40), (1L, "resident", 10)))
      .toDF("cell_id", "people_kind", "n_people")
    val out = HumanRespiration.peopleToEmissions(spark, pop,
      Seq(("resident", "CO2", 0.25), ("worker", "CO2", 0.125)), timeRatio = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(2)) -> r.getDouble(3)).toMap
    assert(out((0L, "CO2")) == 100 * 0.25 * 0.5 + 40 * 0.125 * 0.5) // 15.0
    assert(out((1L, "CO2")) == 1.25)
  }

  test("vprm standard model on a hand-computed observation") {
    val obs = spark.createDataFrame(Seq(
      ("grass", "t0", 20.0, 50.5, 0.5, 0.2),
      ("grass", "t1", 1.0, 101.0, 0.5, 0.8)))
      .toDF("veg_type", "ts", "t", "rad", "lswi", "evi")
    val params = spark.createDataFrame(Seq(
      ("grass", 0.5, 1.0, 0.5, 0.0, 20.0, 40.0, 2.0, 100.0)))
      .toDF("veg_type", "alpha", "beta", "lambda",
        "tmin", "topt", "tmax", "tlow", "par0")
    val out = graft.ops.Vprm.calculateEmissions(obs, params)
      .collect().map(r => r.getString(1) -> r).toMap
    val r0 = out("t0")
    // T=20=Topt -> Tscale = Tprod/(Tprod-0) = 1; PAR=100
    assert(r0.getAs[Double]("tscale") == 1.0)
    assert(r0.getAs[Double]("wscale") == 1.0) // lswi == max
    // evi 0.2 < thr(0.2+0.55*0.6=0.53) -> pscale=(1+0.5)/2
    assert(r0.getAs[Double]("pscale") == 0.75)
    assert(r0.getAs[Double]("resp") == 0.5 * 20 + 1)
    val expGee = -(0.5 * 1.0 * 0.75 * 1.0 * 0.2 * 100.0 / (1.0 + 100.0 / 100.0))
    assert(math.abs(r0.getAs[Double]("gee") - expGee) < 1e-12)
    val r1 = out("t1")
    assert(r1.getAs[Double]("resp") == 0.5 * 2.0 + 1.0) // clamped at Tlow
    assert(r1.getAs[Double]("pscale") == 1.0) // evi 0.8 >= thr
  }

  test("wrf mole flux applies molar-mass and area/time conversion") {
    val emi = spark.createDataFrame(Seq((0L, "c", "NOx", 46.0)))
      .toDF("cell_id", "category", "substance", "value")
    val out = graft.sinks.Exports.wrfMoleFlux(spark, emi,
      Seq(("NOx", 46.0)), cellAreaKm2 = 2.0)
      .collect()(0).getAs[Double]("mole_km2_h")
    assert(math.abs(out - 46.0 * (1000.0 / 46.0) / 2.0 / 8766.0) < 1e-12)
  }

  test("text export writes delimiter-joined lines") {
    val df = spark.createDataFrame(Seq((1L, "a", 2.5))).toDF("id", "k", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft-txt").resolve("t").toString
    graft.sinks.Exports.textExport(df, dir, sep = ";")
    val lines = spark.read.text(dir).collect().map(_.getString(0))
    assert(lines.toSeq == Seq("1;a;2.5"))
  }

  test("unit conversions round-trip and match constants") {
    val df = spark.range(1).select(lit(31557600.0).as("v"))
    val flux = df.select(Units.kgPerYearToFlux(col("v"), cellAreaM2 = 1.0))
      .collect()(0).getDouble(0)
    assert(flux == 1.0)
    val back = df.select(
      Units.fluxToKgPerYear(Units.kgPerYearToFlux(col("v"), 100.0), 100.0))
      .collect()(0).getDouble(0)
    assert(back == 31557600.0)
    val mol = df.select(Units.kgPerYearToMolPerYear(lit(46.0), 46.0))
      .collect()(0).getDouble(0)
    assert(mol == 1000.0)
    // reference tests/utils/test_molar_mass.py + test_unit_conversion.py
    assert(Units.molarMass("CH4") == 16.04 && Units.molarMass("CO2") == 44.009)
    assert(Units.molarMass("N2O") == 44.013 && Units.molarMass("C") == 12.01)
    intercept[IllegalArgumentException](Units.molarMass("SOMETHING UNKNOWN"))
    assert(Units.scalingFactorToEmiproc("kg/m2/s") ==
      ((365.25 * 86400.0, true)))
    Seq("kg/y/cell", "kg y-1 cell-1", "kg/year/cell").foreach { u =>
      assert(Units.scalingFactorToEmiproc(u) == ((1.0, false)))
    }
    assert(Units.scalingFactorToEmiproc("kg/year/m2") == ((1.0, true)))
    intercept[IllegalArgumentException](
      Units.scalingFactorToEmiproc("PgC/yr", Some("CH4")))
    assert(Units.scalingFactorToEmiproc("PgC/yr", Some("CO2")) ==
      ((1e12 * (44.009 / 12.01), false)))
    assert(Units.scalingFactorToEmiproc("micromol/m2/s", Some("CH4")) ==
      ((1e-3 * 16.04 * 1e-6 * 86400.0 * 365.25, true)))
    intercept[NotImplementedError](
      Units.scalingFactorToEmiproc("unsupported_unit"))
  }

  test("toInventoryWithUnit resolves any reference unit per variable") {
    import graft.sources.RasterTable
    import graft.model.RegularGrid
    val g = RegularGrid(2, 2, 0.0, 0.0, 1000.0, 1000.0) // 1e6 m2 cells
    val raster = spark.createDataFrame(Seq((0, 0, "ch4_flux", 2.0)))
      .toDF("lon_idx", "lat_idx", "variable", "flux")
    val out = RasterTable.toInventoryWithUnit(spark, raster, g,
      Seq(("ch4_flux", "agri", "CH4")), unit = "micromol/m2/s").collect()(0)
    val expected = 2.0 * (1e-3 * 16.04 * 1e-6 * 86400.0 * 365.25) * 1e6
    assert(out.getDouble(3) == expected)
    // the kg/m2/s path through the generic resolver equals the legacy one
    val legacy = RasterTable.toInventory(spark, raster, g,
      Seq(("ch4_flux", "agri", "CH4"))).collect()(0).getDouble(3)
    assert(legacy == 2.0 * g.cellArea * RasterTable.SecPerYear)
    // CO2-only unit errors for the wrong substance at plan-build time
    intercept[IllegalArgumentException](RasterTable.toInventoryWithUnit(
      spark, raster, g, Seq(("ch4_flux", "agri", "CH4")), unit = "PgC/yr"))
  }
}
