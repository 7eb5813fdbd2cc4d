package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.RegularGrid

/** S9 — LPJ-GUESS model-output loader (reference `LPJ_GUESS_Inventory`,
  * emiproc/inventories/lpjguess.py:13-132): NetCDF outputs whose
  * variables are named `<substance>_<category…>` (split on `_`,
  * substance = first token, category = the rest rejoined —
  * lpjguess.py:44-47), all in `mg CH4 m-2 d-1` (asserted, :49-54),
  * daily over a `time` dimension. Annual inventory value =
  * Σ_days × 10⁻⁶ × cell_area (mg → kg, :93-97); the per-cell daily
  * series normalized by its total is the day-of-year profile, cells
  * with zero total get no profile (the reference's `-1` index,
  * :108-125).
  *
  * Output: `annual(cell_id, category, substance, value)` kg/y and
  * `dailyRatios(category, substance, cell_id, pos, ratio)` sparse.
  */
object LpjGuessLoader {

  val ExpectedUnits = "mg CH4 m-2 d-1"

  final case class LpjInventory(
      grid: RegularGrid,
      annual: DataFrame,
      dailyRatios: DataFrame)

  def read(
      spark: SparkSession,
      paths: Seq[String],
      year: Int): LpjInventory = {
    require(paths.nonEmpty, "no LPJ-GUESS files given")
    var grid: Option[RegularGrid] = None
    val annualRows = scala.collection.mutable.ListBuffer.empty[(Long, String, String, Double)]
    val ratioRows = scala.collection.mutable.ListBuffer.empty[(String, String, Long, Int, Double)]

    paths.foreach { path =>
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
      // container-independent: classic CDF-1/2 or NetCDF-4/HDF5 dispatch
      val f = NcAdapter.open(bytes)
      val lats = f.doubles("latitude")
      val lons = f.doubles("longitude")
      val (ymin, dy) = NetcdfRaster.regularAxis(lats)
      val (xmin, dx) = NetcdfRaster.regularAxis(lons)
      val g = RegularGrid(lons.length, lats.length, xmin, ymin, dx, dy)
      grid.foreach(g0 => require(g0 == g, s"$path: grid $g differs from $g0"))
      grid = Some(g)
      val nLat = lats.length; val nLon = lons.length
      val perDay = nLat * nLon

      val dataVars = f.varNames
        .filterNot(Seq("longitude", "latitude", "time").contains)
      dataVars.foreach { name =>
        val units = f.attText(name, "units")
        require(units == ExpectedUnits,
          s"$name has units $units instead of $ExpectedUnits")
        val parts = name.split("_")
        val (sub, cat) = (parts.head, parts.tail.mkString("_"))
        val shape = f.shape(name)
        require(shape.length == 3 && shape(1) == nLat && shape(2) == nLon,
          s"$name: expected (time, latitude, longitude), got $shape")
        val days = shape.head
        val data = f.doubles(name)
        for (i <- 0 until nLat; j <- 0 until nLon) {
          val cellId = j.toLong * nLat + i
          var total = 0.0
          var d = 0
          while (d < days) {
            val x = data(d * perDay + i * nLon + j)
            if (!x.isNaN) total += x
            d += 1
          }
          if (total != 0.0) {
            val area = GfasLoader.sphericalCellArea(
              lats(i) - dy / 2, lats(i) + dy / 2, dx)
            annualRows += ((cellId, cat, sub, total * 1e-6 * area))
            d = 0
            while (d < days) {
              val x = data(d * perDay + i * nLon + j)
              if (!x.isNaN && x != 0.0)
                ratioRows += ((cat, sub, cellId, d, x / total))
              d += 1
            }
          }
        }
      }
    }
    LpjInventory(
      grid.get,
      spark.createDataFrame(annualRows.toSeq)
        .toDF("cell_id", "category", "substance", "value"),
      spark.createDataFrame(ratioRows.toSeq)
        .toDF("category", "substance", "cell_id", "pos", "ratio"))
  }
}
