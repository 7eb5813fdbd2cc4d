package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.RegularGrid

/** Generic CF-raster ingestion SEMANTICS (the reference's most valuable
  * scan, `NetcdfRaster` — emiproc/inventories/netcdf_raster.py:112-295,
  * and the EDGAR flux path, emiproc/inventories/edgar/edgarv8.py:32-137)
  * over a columnar stand-in: this environment has no NetCDF library, so
  * the raster arrives as a long table `(lon_idx, lat_idx, variable,
  * flux)` (FIXTURES.md §3 — exactly what a thin NetCDF→Parquet converter
  * emits); everything the reference's reader DOES to that data is here:
  *
  *  - variable → (category, substance) mapping (broadcast dim),
  *  - unit conversion kg m⁻² s⁻¹ → kg/y/cell (× cell_area × SEC_PER_YR),
  *  - index → x-major cell_id on the declared [[RegularGrid]],
  *  - optional variable subsetting (pushdown-able filter).
  */
object RasterTable {

  val SecPerYear: Double = 365.25 * 86400.0

  /** `raster(lon_idx, lat_idx, variable, flux)` ⋈ `mapping(variable,
    * category, substance)` → long inventory `(cell_id, category,
    * substance, value)` in kg/y/cell. */
  def toInventory(
      spark: SparkSession,
      raster: DataFrame,
      grid: RegularGrid,
      mapping: Seq[(String, String, String)],
      fluxUnits: Boolean = true): DataFrame =
    toInventoryWithUnit(spark, raster, grid, mapping,
      unit = if (fluxUnits) "kg/m2/s" else "kg/y/cell")

  /** [[toInventory]] for ANY unit string the reference's
    * `get_scaling_factor_to_emiproc` accepts
    * ([[graft.functions.Units.scalingFactorToEmiproc]]; netcdf_raster.py
    * resolves the variable's `units` attribute the same way, incl. the
    * substance-dependent micromol and CO2-only PgC/yr paths). The
    * per-variable factor is resolved driver-side from the mapping
    * (metadata-scale), so the fact scan stays one narrow projection. */
  def toInventoryWithUnit(
      spark: SparkSession,
      raster: DataFrame,
      grid: RegularGrid,
      mapping: Seq[(String, String, String)],
      unit: String): DataFrame = {
    val withFactor = mapping.map { case (v, c, s) =>
      val (f, byArea) = graft.functions.Units.scalingFactorToEmiproc(unit, Some(s))
      (v, c, s, if (byArea) f * grid.cellArea else f)
    }
    val dim = spark.createDataFrame(withFactor)
      .toDF("variable", "category", "substance", "_conv")
    raster
      .join(broadcast(dim), "variable")
      .select(
        (col("lon_idx").cast("long") * grid.ny + col("lat_idx")).as("cell_id"),
        col("category"), col("substance"),
        (col("flux") * col("_conv")).as("value"))
  }
}
