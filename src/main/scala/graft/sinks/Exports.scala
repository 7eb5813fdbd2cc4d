package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.RegularGrid
import graft.profiles.Temporal

/** Export sinks — idiomatic Spark substitutes for the reference's NetCDF/
  * GeoPackage writers (the container has no NetCDF library; parquet is the
  * engine-native interchange and the schemas carry the same information).
  */
object Exports {

  /** CF-raster-style export (reference `export_raster_netcdf`,
    * emiproc/exports/rasters.py:14-323): one row per cell with x/y
    * coordinates and one column per substance (categories summed — the
    * `sum_categories` path), written as parquet. Returns the wide frame.
    * Unit conversion kg/y/cell → kg/m2/s is the optional `perArea` flag
    * (reference :95-108; SEC_PER_YEAR = 365.25·86400 as in
    * emiproc/utilities.py SEC_PER_YR). */
  val SecPerYear: Double = 365.25 * 86400.0

  def rasterExport(
      emissions: DataFrame,
      grid: RegularGrid,
      path: Option[String] = None,
      perArea: Boolean = false): DataFrame = {
    val conv = if (perArea) 1.0 / (grid.cellArea * SecPerYear) else 1.0
    val wide = emissions
      .groupBy("cell_id")
      .pivot("substance")
      .agg(sum(col("value") * conv))
      .na.fill(0.0)
      .withColumn("x", grid.cellXc(col("cell_id")))
      .withColumn("y", grid.cellYc(col("cell_id")))
    path.foreach { p =>
      wide.write.mode("overwrite").parquet(p)
      writeCfAttributes(wide, grid, p, perArea)
    }
    wide
  }

  /** K9 — CF metadata attributes for a raster export (reference
    * `DEFAULT_NC_ATTRIBUTES` + per-variable units/standard_name,
    * emiproc/exports/rasters.py:118-197). Parquet has no NetCDF-style
    * global attributes, so the same information rides a `_cf_attrs.json`
    * sidecar in the export directory: global CF keys + one entry per
    * substance column with units and coordinate declarations. */
  def writeCfAttributes(
      wide: DataFrame,
      grid: RegularGrid,
      path: String,
      perArea: Boolean): Unit = {
    val units = if (perArea) "kg m-2 s-1" else "kg year-1 cell-1"
    val subs = wide.columns.filterNot(Seq("cell_id", "x", "y").contains)
    def q(s: String) = "\"" + s + "\""
    val vars = subs.map(s0 =>
      s"${q(s0)}: {${q("units")}: ${q(units)}, ${q("coordinates")}: ${q("x y")}}")
      .mkString(", ")
    val json =
      s"""{${q("Conventions")}: ${q("CF-1.8")},
         | ${q("source")}: ${q("graft emission inventory export")},
         | ${q("grid")}: {${q("nx")}: ${grid.nx}, ${q("ny")}: ${grid.ny},
         |   ${q("xmin")}: ${grid.xmin}, ${q("ymin")}: ${grid.ymin},
         |   ${q("dx")}: ${grid.dx}, ${q("dy")}: ${grid.dy}},
         | ${q("variables")}: {$vars}}""".stripMargin
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), wide.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(path, "_cf_attrs.json"), true)
    out.write(json.getBytes("UTF-8"))
    out.close()
  }

  /** The totals block of the raster export (reference rasters.py:247-306):
    * per-substance per-category sums plus grand totals — a rollup. */
  def rasterTotals(emissions: DataFrame): DataFrame =
    graft.ops.Grouping.totals(emissions)

  /** Hourly export (reference `export_hourly_emissions`,
    * emiproc/exports/hourly.py:22-224): temporal explode then a
    * partitioned write — one directory per hour replaces one file per
    * hour; readers prune partitions by `ts_str`. */
  def hourlyExport(
      emissions: DataFrame,
      scalingFactors: DataFrame,
      startTs: String,
      hours: Int,
      path: String): Unit =
    Temporal.temporalExplode(emissions, scalingFactors, startTs, hours)
      .write.mode("overwrite")
      .partitionBy("ts_str")
      .parquet(path)

  /** Fluxie-style monthly flux export (reference `export_fluxie`,
    * emiproc/exports/fluxie.py:24-199): per-month flux rasters — wide
    * pivot of months with kg/y → kg m⁻² s⁻¹ conversion applied per
    * month's share. Input needs a `month` column (1-12). */
  def monthlyFluxExport(
      emissions: DataFrame,
      grid: RegularGrid,
      path: Option[String] = None): DataFrame = {
    val conv = 1.0 / (grid.cellArea * SecPerYear)
    val wide = emissions
      .groupBy("cell_id", "substance")
      .pivot("month", (1 to 12).map(_.toString))
      .agg(sum(col("value") * conv))
      .na.fill(0.0)
      .withColumn("x", grid.cellXc(col("cell_id")))
      .withColumn("y", grid.cellYc(col("cell_id")))
    path.foreach(p => wide.write.mode("overwrite").parquet(p))
    wide
  }

  /** WRF-chemi unit path (reference `export_wrf_hourly_emissions`,
    * emiproc/exports/wrf.py:129-240 + molar masses
    * emiproc/utils/constants.py:22): kg/y/cell → mole km⁻² h⁻¹ via a
    * broadcast molar-mass dim: v · (1000/M) / areaKm2 / (365.25·24). */
  def wrfMoleFlux(
      spark: SparkSession,
      emissions: DataFrame,
      molarMasses: Seq[(String, Double)],
      cellAreaKm2: Double): DataFrame = {
    val dim = spark.createDataFrame(molarMasses).toDF("substance", "molar_mass")
    val hoursPerYear = 365.25 * 24.0
    emissions
      .join(broadcast(dim), "substance")
      .select(
        col("cell_id"), col("category"), col("substance"),
        (col("value") * (lit(1000.0) / col("molar_mass")) / cellAreaKm2 / hoursPerYear)
          .as("mole_km2_h"))
  }

  /** Plain text sink (the GRAL-style text writers of reference
    * emiproc/exports/gral.py:65-349 reduced to their Spark-native form):
    * rows rendered with a separator, written as partitioned text. */
  def textExport(df: DataFrame, path: String, sep: String = ","): Unit =
    df.select(concat_ws(sep, df.columns.map(col): _*).as("value"))
      .write.mode("overwrite").text(path)

  /** GeoParquet-style export (reference `export_to_geopackage`,
    * emiproc/exports/geopackage.py:9-60): cell polygons as WKT plus
    * envelope columns (xmin…ymax) so engines without a geometry reader
    * can still prune by bbox. */
  def geoParquetExport(
      spark: SparkSession,
      emissions: DataFrame,
      grid: RegularGrid,
      path: Option[String] = None): DataFrame = {
    val cells = grid.cells(spark)
    val wkt = concat(
      lit("POLYGON(("),
      col("xmin"), lit(" "), col("ymin"), lit(", "),
      col("xmax"), lit(" "), col("ymin"), lit(", "),
      col("xmax"), lit(" "), col("ymax"), lit(", "),
      col("xmin"), lit(" "), col("ymax"), lit(", "),
      col("xmin"), lit(" "), col("ymin"), lit("))"))
    val out = emissions
      .join(cells, "cell_id")
      .withColumn("geometry_wkt", wkt)
    path.foreach(p => out.write.mode("overwrite").parquet(p))
    out
  }
}
