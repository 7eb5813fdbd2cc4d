package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.RegularGrid

/** CF-convention raster reader over [[NetcdfClassic]] — the reference's
  * `NetcdfRaster` entry point (emiproc/inventories/netcdf_raster.py:
  * 112-295: open dataset, locate lat/lon coordinate variables, derive the
  * regular grid from their spacing, read each emission variable, convert
  * flux → mass/cell) for classic-format files, with no NetCDF library.
  *
  * Coordinate detection: a 1-D variable named lat/latitude/y (resp.
  * lon/longitude/x) or carrying `units` of degrees_north/degrees_east.
  * The grid is validated as REGULAR (uniform spacing) — the reference
  * asserts the same before treating the raster as a RegularGrid.
  *
  * Scale note: one file parses on the driver (raster variables are
  * grid-sized, ≪ fact data). For fleets of files, run the same pure
  * parser inside `binaryFile` + `mapPartitions` tasks.
  */
object NetcdfRaster {

  import NetcdfClassic._

  private val LatNames = Set("lat", "latitude", "y")
  private val LonNames = Set("lon", "longitude", "x")

  private def unitsOf(v: NcVar): String =
    v.atts.find(_.name == "units").map(_.text).getOrElse("")

  private def findCoord(f: NcFile, names: Set[String], units: String): NcVar =
    f.vars.find(v => v.dimIds.length == 1 &&
      (names.contains(v.name.toLowerCase) || unitsOf(v).startsWith(units)))
      .getOrElse(throw new NoSuchElementException(
        s"no coordinate variable among ${names.mkString("/")}"))

  /** Centers array → (min edge, spacing), validating uniformity. */
  private[graft] def regularAxis(centers: Array[Double], tol: Double = 1e-6): (Double, Double) = {
    require(centers.length >= 2, "axis needs >= 2 points")
    val d = centers(1) - centers(0)
    centers.sliding(2).foreach { w =>
      require(math.abs((w(1) - w(0)) - d) <= tol * math.abs(d),
        s"axis not regular: spacing ${w(1) - w(0)} vs $d")
    }
    (centers(0) - d / 2, d)
  }

  /** PURE parser: classic raster bytes → (grid, `(lon_idx, lat_idx,
    * variable, flux)` rows), NaN cells dropped. No Spark involved, so it
    * runs equally on the driver (single file) or inside `binaryFile`
    * tasks (file fleets — [[GlobalRasters.readEdgarDirDistributed]]). */
  def parseRaster(
      bytes: Array[Byte],
      variables: Option[Seq[String]] = None): (RegularGrid, Seq[(Int, Int, String, Double)]) = {
    val f = readHeader(bytes)
    val latVar = findCoord(f, LatNames, "degrees_north")
    val lonVar = findCoord(f, LonNames, "degrees_east")
    val lats = readVarDoubles(bytes, f, latVar.name)
    val lons = readVarDoubles(bytes, f, lonVar.name)
    val (ymin, dy) = regularAxis(lats)
    val (xmin, dx) = regularAxis(lons)
    val grid = RegularGrid(lons.length, lats.length, xmin, ymin, dx, dy)

    val latDim = latVar.dimIds.head
    val lonDim = lonVar.dimIds.head
    val wanted = variables.getOrElse(
      f.vars.filter(v => v.dimIds.length >= 2 &&
        v.dimIds.contains(latDim) && v.dimIds.contains(lonDim)).map(_.name).toSeq)

    val rows = wanted.flatMap { name =>
      val v = f.variable(name)
      require(v.dimIds.length == 2, s"$name: only 2-D (lat,lon)/(lon,lat) supported")
      val data = readVarDoubles(bytes, f, name)
      val latFirst = v.dimIds.head == latDim
      val nLon = lons.length
      val nLat = lats.length
      for {
        i <- 0 until nLat
        j <- 0 until nLon
        flux = if (latFirst) data(i * nLon + j) else data(j * nLat + i)
        if !flux.isNaN
      } yield (j, i, name, flux)
    }
    (grid, rows)
  }

  /** Read one classic NetCDF raster file: grid from the lat/lon coords,
    * `(lon_idx, lat_idx, variable, flux)` rows for each requested
    * variable (all non-coordinate 2-D+ variables when None), NaN cells
    * dropped. Feed the result to [[RasterTable.toInventory]]. */
  def read(
      spark: SparkSession,
      path: String,
      variables: Option[Seq[String]] = None): (RegularGrid, DataFrame) = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val (grid, rows) = parseRaster(bytes, variables)
    val df = spark.createDataFrame(rows)
      .toDF("lon_idx", "lat_idx", "variable", "flux")
    (grid, df)
  }
}
