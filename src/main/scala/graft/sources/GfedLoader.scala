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
  * Container format: files parse through the container-independent
  * [[NcAdapter]] — classic CDF-1/2 via [[NetcdfClassic]], NetCDF-4/HDF5
  * via [[Hdf5Classic]], dispatched on the magic — so whichever container
  * a given GFED5 Beta distribution ships as (unconfirmable offline;
  * FIXTURES.md §6), it loads without conversion.
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
      // container-independent: classic CDF-1/2 or NetCDF-4/HDF5 dispatch
      val f = NcAdapter.open(bytes)
      val la = f.doubles("lat")
      val lo = f.doubles("lon")
      val (ymin, dy) = NetcdfRaster.regularAxis(la)
      val (xmin, dx) = NetcdfRaster.regularAxis(lo)
      val g = RegularGrid(lo.length, la.length, xmin, ymin, dx, dy)
      grid.foreach(g0 => require(g0 == g, s"$path: grid $g differs from $g0"))
      grid = Some(g); lats = la
      val nLat = la.length; val nLon = lo.length
      val perDay = nLat * nLon

      var fileDays = 0
      substances.foreach { sub =>
        require(f.hasVar(sub),
          s"Substance $sub not in the dataset.") // gfed.py:343-345
        val shape = f.shape(sub)
        require(shape.length == 3 && shape(1) == nLat && shape(2) == nLon,
          s"$sub: expected (time, lat, lon), got $shape")
        val days = shape.head
        fileDays = days
        val data = f.doubles(sub)
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

  // ---- GFED4 (HDF5 container) ------------------------------------------

  final case class Gfed4Inventory(
      grid: RegularGrid,
      /** (cell_id, category, substance, value) kg/cell/year — Σ months */
      annual: DataFrame,
      /** (cell_id, category, month, value) kg/cell/month — MounthsProfile source */
      monthly: DataFrame,
      /** (cell_id, doy, ratio) day-of-year ratios, Σ_year = 1 per cell */
      dayOfYear: DataFrame,
      /** (cell_id, slot, ratio) 96 = 8×3-hourly × 12 months (Hour3OfDayPerMonth) */
      diurnal: DataFrame)

  /** S3 — GFED4 loader (reference `GFED4_Inventory`,
    * emiproc/inventories/gfed.py:104-305) over the pure-JVM
    * [[Hdf5Classic]] reader: per month `m`, emissions =
    * `/emissions/mm/DM × /emissions/mm/partitioning/<use>_<cat>` summed
    * over months and scaled by `/ancill/grid_cell_area` → kg/cell/year
    * (gfed.py:145-185); category names drop the variable prefix
    * (`DM_SAVA` → `SAVA`, :173-174); cell index is lon-major like the
    * reference's `stack(cell=("lon","lat"))` (:185-188). Day-of-year
    * ratios from `daily_fraction/day_N` normalized over the year
    * (:203-230) and the 96-slot 3-hourly-per-month cycle from
    * `diurnal_cycle/UTC_*` (:232-268) feed the composite-profile
    * machinery ([[graft.profiles.Temporal]]) exactly as the reference
    * feeds `CompositeTemporalProfiles`. */
  def readGfed4(
      spark: SparkSession,
      path: String,
      useVariable: String = "DM"): Gfed4Inventory = {
    require(useVariable == "DM" || useVariable == "C",
      "use_variable must be either 'C' or 'DM'") // gfed.py:133-134
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val h5 = Hdf5Classic.open(bytes)

    // grid: lon/lat are stored per-cell (2-D) in GFED4; every row/column
    // is identical on the regular grid (GFED_Grid asserts this, :78-86)
    val lonDs = h5.readDataset("/lon")
    val latDs = h5.readDataset("/lat")
    val (lons, lats) = (lonDs.dims, latDs.dims) match {
      case (Seq(_, nx), Seq(_, _)) =>
        val lo = Array.tabulate(nx)(j => lonDs.data(j))
        val la = Array.tabulate(latDs.dims.head)(i => latDs.data(i * nx))
        (lo, la)
      case (Seq(_), Seq(_)) => (lonDs.data, latDs.data)
      case other => throw new IllegalArgumentException(s"lon/lat dims $other")
    }
    val (xmin, dx) = NetcdfRaster.regularAxis(lons)
    val (ymin, dy) = NetcdfRaster.regularAxis(lats)
    val grid = RegularGrid(lons.length, lats.length, xmin, ymin, dx, dy)
    val nLat = lats.length; val nLon = lons.length
    val area = h5.readDataset("/ancill/grid_cell_area").data

    def cellId(i: Int, j: Int): Long = j.toLong * nLat + i // lon-major stack

    val monthlyRows = scala.collection.mutable.ListBuffer.empty[(Long, String, Int, Double)]
    val doyAcc = scala.collection.mutable.Map.empty[(Long, Int), Double]
    val diurnalRows = scala.collection.mutable.ListBuffer.empty[(Long, Int, Double)]
    var doy = 0

    (1 to 12).foreach { m =>
      val g = f"/emissions/$m%02d"
      val dm = h5.readDataset(s"$g/DM").data
      val cats = h5.list(s"$g/partitioning").filter(_.startsWith(useVariable + "_"))
      cats.foreach { catVar =>
        val frac = h5.readDataset(s"$g/partitioning/$catVar").data
        val cat = catVar.split("_").last // gfed.py:173-174
        var i = 0
        while (i < nLat) {
          var j = 0
          while (j < nLon) {
            val p = i * nLon + j
            val v = dm(p) * frac(p) * area(p)
            if (!v.isNaN && v != 0.0)
              monthlyRows += ((cellId(i, j), cat, m, v))
            j += 1
          }
          i += 1
        }
      }
      // daily fractions: day_1 .. day_N present per month (gfed.py:208-218)
      val days = h5.list(s"$g/daily_fraction")
        .filter(_.startsWith("day_")).map(_.drop(4).toInt).sorted
      days.foreach { d =>
        val f = h5.readDataset(s"$g/daily_fraction/day_$d").data
        var i = 0
        while (i < nLat) {
          var j = 0
          while (j < nLon) {
            val v = f(i * nLon + j)
            if (!v.isNaN && v != 0.0) doyAcc((cellId(i, j), doy + d)) = v
            j += 1
          }
          i += 1
        }
      }
      doy += days.length
      // 3-hourly cycle: 8 slots per month -> slot = 8·(m−1)+h (gfed.py:255-258)
      val slots = Seq("UTC_0-3h", "UTC_3-6h", "UTC_6-9h", "UTC_9-12h",
        "UTC_12-15h", "UTC_15-18h", "UTC_18-21h", "UTC_21-24h")
      slots.zipWithIndex.foreach { case (name, h) =>
        val f = h5.readDataset(s"$g/diurnal_cycle/$name").data
        var i = 0
        while (i < nLat) {
          var j = 0
          while (j < nLon) {
            val v = f(i * nLon + j)
            if (!v.isNaN && v != 0.0)
              diurnalRows += ((cellId(i, j), 8 * (m - 1) + h, v))
            j += 1
          }
          i += 1
        }
      }
    }

    // day-of-year ratios normalized over the year per cell (gfed.py:220-222)
    val cellDoySum = doyAcc.toSeq.groupBy(_._1._1)
      .map { case (c, xs) => c -> xs.map(_._2).sum }
    val doyRows = doyAcc.toSeq.map { case ((c, d), v) =>
      (c, d, v / cellDoySum(c))
    }.sortBy(r => (r._1, r._2))

    val monthly = spark.createDataFrame(monthlyRows.toSeq)
      .toDF("cell_id", "category", "month", "value")
    val annual = monthly.groupBy("cell_id", "category")
      .agg(org.apache.spark.sql.functions.sum("value").as("value"))
      .withColumn("substance", org.apache.spark.sql.functions.lit(useVariable))
      .select("cell_id", "category", "substance", "value")
    Gfed4Inventory(
      grid, annual, monthly,
      spark.createDataFrame(doyRows).toDF("cell_id", "doy", "ratio"),
      spark.createDataFrame(diurnalRows.toSeq).toDF("cell_id", "slot", "ratio"))
  }
}
