package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.RegularGrid

/** GFAS fire-emission loader — reference `GFAS_Inventory`
  * (emiproc/inventories/gfas.py:33-130): a year of DAILY fluxes
  * (kg m⁻² s⁻¹) per variable named `<substance>fire` (co2fire → CO2),
  * on a global lon/lat grid. Annual value per cell =
  * mean(daily flux) × SEC_PER_YR × spherical cell area
  * (gfas.py:105-112); the daily series doubles as the day-of-year
  * temporal profile source (`ratios_dataarray_to_profiles` — here the
  * sparse long series, normalize with `Profiles.normalize` and dedup
  * with `Profiles.dedupVectors`).
  *
  * Cell areas use the reference's spherical formula
  * (emiproc/grids.py:791-806): R² · Δlon_rad · |sin(lat₊) − sin(lat₋)|
  * with R = 6371000 m (emiproc/utils/constants.py:30).
  */
object GfasLoader {

  val REarth = 6371000.0
  val SecPerYear: Double = 365.25 * 86400.0 // utils/constants.py:1-6

  def sphericalCellArea(latLo: Double, latHi: Double, dlonDeg: Double): Double =
    REarth * REarth * math.toRadians(dlonDeg) *
      math.abs(math.sin(math.toRadians(latHi)) - math.sin(math.toRadians(latLo)))

  final case class GfasInventory(
      grid: RegularGrid,
      annual: DataFrame, // (cell_id, category, substance, value) kg/yr
      dailySeries: DataFrame) // (substance, cell_id, pos, flux) sparse

  def read(
      spark: SparkSession,
      path: String,
      variables: Option[Seq[String]] = None): GfasInventory = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    // container-independent: classic CDF-1/2 or NetCDF-4/HDF5 dispatch
    val f = NcAdapter.open(bytes)
    val lats = f.doubles("latitude")
    val lons = f.doubles("longitude")
    val (ymin, dy) = NetcdfRaster.regularAxis(lats)
    val (xmin, dx) = NetcdfRaster.regularAxis(lons)
    val grid = RegularGrid(lons.length, lats.length, xmin, ymin, dx, dy)

    val fireVars = variables.getOrElse(
      f.varNames.filter(_.endsWith("fire")))
    require(fireVars.nonEmpty, "no *fire variables in the GFAS file")

    val nLat = lats.length
    val nLon = lons.length
    val perDay = nLat * nLon
    val areas = lats.map(lc => sphericalCellArea(lc - dy / 2, lc + dy / 2, dx))

    val annualRows = scala.collection.mutable.ListBuffer.empty[(Long, String, String, Double)]
    val dailyRows = scala.collection.mutable.ListBuffer.empty[(String, Long, Int, Double)]
    fireVars.foreach { name =>
      val shape = f.shape(name)
      require(shape.length == 3 && shape(1) == nLat && shape(2) == nLon,
        s"$name: expected (time, latitude, longitude), got $shape")
      val days = shape.head
      require(days == 365 || days == 366,
        s"$name: expected one full year of daily data, got $days steps (gfas.py:63-69)")
      val sub = name.stripSuffix("fire").toUpperCase
      val data = f.doubles(name)
      for (i <- 0 until nLat; j <- 0 until nLon) {
        val cellId = j.toLong * nLat + i
        var s = 0.0
        var t = 0
        while (t < days) {
          val flux = data(t * perDay + i * nLon + j)
          if (!flux.isNaN && flux != 0.0) {
            s += flux
            dailyRows += ((sub, cellId, t, flux))
          }
          t += 1
        }
        if (s != 0.0) {
          val annualMean = s / days
          annualRows += ((cellId, "gfas", sub, annualMean * SecPerYear * areas(i)))
        }
      }
    }
    GfasInventory(
      grid,
      spark.createDataFrame(annualRows.toSeq)
        .toDF("cell_id", "category", "substance", "value"),
      spark.createDataFrame(dailyRows.toSeq)
        .toDF("substance", "cell_id", "pos", "flux"))
  }
}
