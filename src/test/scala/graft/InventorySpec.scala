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
  }
}
