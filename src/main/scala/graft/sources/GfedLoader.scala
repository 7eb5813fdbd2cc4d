package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.RegularGrid

/** S3 — GFED5 fire emissions loader (reference `GFED5`,
  * emiproc/inventories/gfed.py:308-372): twelve monthly files
  * `GFED5_Beta_daily_<year><month>.nc`, each holding per-substance DAILY
  * fluxes in g m⁻² day⁻¹ over a regular lat/lon grid. Annual inventory
  * value = Σ_days flux × 10⁻³ × cell_area (gfed.py:355-362, the
  * kg-per-cell conversion), and the daily series doubles as the
  * day-of-year profile source (gfed.py:366-371 builds
  * `DayOfYearProfile` ratios from the same stack — normalize the
  * returned series with `Profiles.normalize`).
  *
  * Container format: this reader parses NetCDF CLASSIC files via the
  * pure-JVM [[NetcdfClassic]]. GFED5 Beta distributions are produced
  * with modern netCDF tooling and may ship as NetCDF-4/HDF5 — byte-level
  * confirmation needs the actual download (no network in this
  * environment; FIXTURES.md records the finding). HDF5 containers are
  * out of scope (same documented limit as GFED4); `nccopy -k classic`
  * conversion, a standard step, makes any of them loadable here.
  * Semantics above are container-independent.
  */
object GfedLoader {

  final case class GfedInventory(
      grid: RegularGrid,
      annual: DataFrame, // (cell_id, category, substance, value) kg/y
      dailySeries: DataFrame) // (substance, cell_id, pos, flux) day-of-year

  def read(
      spark: SparkSession,
      dir: String,
      year: Int,
      substances: Seq[String]): GfedInventory = {
    import NetcdfClassic._
    val files = (1 to 12).map(m => f"$dir/GFED5_Beta_daily_$year$m%02d.nc")
    files.foreach(p => require(java.nio.file.Files.exists(java.nio.file.Paths.get(p)),
      s"File $p does not exist.")) // gfed.py:328-330

    var grid: Option[RegularGrid] = None
    var lats: Array[Double] = null
    var dayOffset = 0
    val annualAcc = scala.collection.mutable.Map.empty[(Long, String), Double]
    val dailyRows = scala.collection.mutable.ListBuffer.empty[(String, Long, Int, Double)]

    files.foreach { path =>
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
      val f = readHeader(bytes)
      val la = readVarDoubles(bytes, f, "lat")
      val lo = readVarDoubles(bytes, f, "lon")
      val (ymin, dy) = NetcdfRaster.regularAxis(la)
      val (xmin, dx) = NetcdfRaster.regularAxis(lo)
      val g = RegularGrid(lo.length, la.length, xmin, ymin, dx, dy)
      grid.foreach(g0 => require(g0 == g, s"$path: grid $g differs from $g0"))
      grid = Some(g); lats = la
      val nLat = la.length; val nLon = lo.length
      val perDay = nLat * nLon

      var fileDays = 0
      substances.foreach { sub =>
        require(f.vars.exists(_.name == sub),
          s"Substance $sub not in the dataset.") // gfed.py:343-345
        val v = f.variable(sub)
        val shape = f.shape(v)
        require(shape.length == 3 && shape(1) == nLat && shape(2) == nLon,
          s"$sub: expected (time, lat, lon), got $shape")
        val days = shape.head
        fileDays = days
        val data = readVarDoubles(bytes, f, sub)
        var d = 0
        while (d < days) {
          var i = 0
          while (i < nLat) {
            var j = 0
            while (j < nLon) {
              val flux = data(d * perDay + i * nLon + j)
              if (!flux.isNaN && flux != 0.0) {
                val cellId = j.toLong * nLat + i
                annualAcc((cellId, sub)) =
                  annualAcc.getOrElse((cellId, sub), 0.0) + flux
                dailyRows += ((sub, cellId, dayOffset + d, flux))
              }
              j += 1
            }
            i += 1
          }
          d += 1
        }
      }
      dayOffset += fileDays
    }

    val g = grid.get
    val annualRows = annualAcc.toSeq.map { case ((cellId, sub), total) =>
      val iy = (cellId % g.ny).toInt
      val area = GfasLoader.sphericalCellArea(
        lats(iy) - g.dy / 2, lats(iy) + g.dy / 2, g.dx)
      (cellId, "gfed", sub, total * 1e-3 * area)
    }.sortBy(r => (r._1, r._3))
    GfedInventory(
      g,
      spark.createDataFrame(annualRows)
        .toDF("cell_id", "category", "substance", "value"),
      spark.createDataFrame(dailyRows.toSeq)
        .toDF("substance", "cell_id", "pos", "flux"))
  }
}
