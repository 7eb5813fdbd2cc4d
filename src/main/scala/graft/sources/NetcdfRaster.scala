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

  /** True when the bytes are an HDF5 container (NetCDF-4 files — the
    * `\x89HDF\r\n\x1a\n` signature) rather than classic CDF-1/2. */
  def isHdf5(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && bytes(0) == 0x89.toByte &&
      bytes(1) == 'H' && bytes(2) == 'D' && bytes(3) == 'F'

  /** Names of the 2-D (lat,lon)/(lon,lat) raster variables in a CF
    * file WITHOUT decoding any data — header/metadata only, both
    * container types. This is the variable-pushdown planning surface
    * of the `netcdf` DataSource V2 ([[graft.sources.v2.NetcdfSource]]):
    * pushed `variable` predicates intersect with this list, and only
    * the survivors are ever decoded. */
  def rasterVariables(bytes: Array[Byte]): Seq[String] =
    if (isHdf5(bytes)) {
      val h5 = Hdf5Classic.open(bytes)
      val names = h5.list("/")
      val (latName, lonName) = h5CoordNames(h5, names)
      val nLat = h5.datasetDims(s"/$latName").head
      val nLon = h5.datasetDims(s"/$lonName").head
      names.filter { n =>
        n != latName && n != lonName && {
          val d = h5.datasetDims(s"/$n")
          d.length == 2 && d.toSet == Set(nLat, nLon)
        }
      }
    } else {
      val f = readHeader(bytes)
      val latDim = findCoord(f, LatNames, "degrees_north").dimIds.head
      val lonDim = findCoord(f, LonNames, "degrees_east").dimIds.head
      // >= 2 dims, MATCHING parseRaster's default detection: a 3-D
      // (time, lat, lon) variable must surface here so parseRaster
      // fails loudly on it — silently dropping it from the listing
      // would make the DSv2 path return partial data where the
      // binaryFile path errors.
      f.vars.filter(v => v.dimIds.length >= 2 &&
        v.dimIds.contains(latDim) && v.dimIds.contains(lonDim))
        .map(_.name).toSeq
    }

  /** CF coordinate pair of an HDF5 raster: by name, else by `units`
    * attribute — shared by [[rasterVariables]] and the decode path so
    * the planning surface and the decoder can't drift. */
  private def h5CoordNames(
      h5: Hdf5Classic.H5, names: Seq[String]): (String, String) = {
    def unitsAttr(n: String): String =
      h5.attributes(s"/$n").find(_.name == "units").map(_.text).getOrElse("")
    def find(cands: Set[String], units: String): String =
      names.find(n => cands.contains(n.toLowerCase))
        .orElse(names.find(n => unitsAttr(n).startsWith(units)))
        .getOrElse(throw new NoSuchElementException(
          s"no coordinate variable among ${cands.mkString("/")}"))
    (find(LatNames, "degrees_north"), find(LonNames, "degrees_east"))
  }

  /** PURE parser: raster bytes → (grid, `(lon_idx, lat_idx,
    * variable, flux)` rows), NaN cells dropped. Dispatches on the magic
    * number: classic CDF-1/2 via [[NetcdfClassic]], NetCDF-4/HDF5
    * containers via [[Hdf5Classic]] — the same CF semantics either way.
    * No Spark involved, so it runs equally on the driver (single file)
    * or inside `binaryFile` tasks (file fleets —
    * [[GlobalRasters.readEdgarDirDistributed]]). */
  def parseRaster(
      bytes: Array[Byte],
      variables: Option[Seq[String]] = None): (RegularGrid, Seq[(Int, Int, String, Double)]) = {
    if (isHdf5(bytes)) return parseRasterHdf5(bytes, variables)
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

  /** NetCDF-4 (HDF5 container) raster path: coordinate variables found
    * by name or `units` attribute among the ROOT group's datasets (the
    * reference's netcdf_raster.py works on flat CF rasters), CF
    * `scale_factor`/`add_offset`/`_FillValue` applied from HDF5
    * attributes. Orientation: `(lat, lon)` when the shape matches that
    * order — CF's standard layout — else `(lon, lat)`. */
  private def parseRasterHdf5(
      bytes: Array[Byte],
      variables: Option[Seq[String]]): (RegularGrid, Seq[(Int, Int, String, Double)]) = {
    val h5 = Hdf5Classic.open(bytes)
    val names = h5.list("/")
    val (latName, lonName) = h5CoordNames(h5, names)
    val lats = h5.readDataset(s"/$latName").data
    val lons = h5.readDataset(s"/$lonName").data
    val (ymin, dy) = regularAxis(lats)
    val (xmin, dx) = regularAxis(lons)
    val grid = RegularGrid(lons.length, lats.length, xmin, ymin, dx, dy)
    val nLat = lats.length; val nLon = lons.length

    // auto-detect via datasetDims (header only), not readDataset — the
    // shared shape predicate of rasterVariables
    val wanted = variables.getOrElse(
      names.filter { n =>
        n != latName && n != lonName && {
          val d = h5.datasetDims(s"/$n")
          d.length == 2 && d.toSet == Set(nLat, nLon)
        }
      })
    val rows = wanted.flatMap { name =>
      val ds = h5.readDataset(s"/$name")
      require(ds.dims.length == 2, s"$name: only 2-D rasters supported")
      val latFirst = ds.dims == Seq(nLat, nLon)
      val atts = h5.attributes(s"/$name")
      def num(a: String): Option[Double] =
        atts.find(_.name == a).flatMap(_.nums.headOption)
      val fill = num("_FillValue").orElse(num("missing_value"))
      val scale = num("scale_factor").getOrElse(1.0)
      val offset = num("add_offset").getOrElse(0.0)
      for {
        i <- 0 until nLat
        j <- 0 until nLon
        raw = if (latFirst) ds.data(i * nLon + j) else ds.data(j * nLat + i)
        if !raw.isNaN && !fill.contains(raw)
        flux = if (scale != 1.0 || offset != 0.0) raw * scale + offset else raw
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
