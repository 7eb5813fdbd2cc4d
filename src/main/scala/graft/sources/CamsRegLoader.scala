package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.RegularGrid

/** S9 — CAMS regional air-quality inventory loader (reference
  * `CAMS_REG_AQ`, emiproc/inventories/cams_reg_aq.py:14-146): a
  * directory of one yearly NetCDF file per pollutant, filenames matching
  * `CAMS-REG-ANT_EUR_0.05x0.1_anthro_<substance>_v6.1-Ref2_yearly_<year>.nc`;
  * the captured substance name maps through `substancesMapping`
  * (:32-41, unmapped → error), each GNFR category variable
  * (`A_PublicPower` … `L_AgriOther`) maps through `categoriesMapping`
  * (:43-56, missing variable → error), units must be `Tg` (:106-110),
  * and values convert Tg → kg (×1e9, :11). Grid from the lat/lon
  * centers of the first file.
  *
  * Output: long `(cell_id, category, substance, value)` in kg/y, zero
  * cells dropped (sparse long format). Files parse through the pure
  * container-independent [[NcAdapter]]; a large fleet runs the same parse inside
  * `binaryFile` tasks like [[GlobalRasters.readEdgarDirDistributed]].
  */
object CamsRegLoader {

  val TgToKg = 1e9 // cams_reg_aq.py:11

  val DefaultSubstances: Map[String, String] = Map(
    "nox" -> "NOx", "co" -> "CO", "ch4" -> "CH4", "nmvoc" -> "VOC",
    "sox" -> "SO2", "nh3" -> "NH3", "pm2_5" -> "PM25", "pm10" -> "PM10")

  val DefaultCategories: Map[String, String] = Map(
    "A_PublicPower" -> "A", "B_Industry" -> "B",
    "C_OtherStationaryComb" -> "C", "D_Fugitives" -> "D",
    "E_Solvents" -> "E", "F_RoadTransport" -> "F", "G_Shipping" -> "G",
    "H_Aviation" -> "H", "I_OffRoad" -> "I", "J_Waste" -> "J",
    "K_AgriLivestock" -> "K", "L_AgriOther" -> "L")

  def read(
      spark: SparkSession,
      dir: String,
      year: Int = 2022,
      substancesMapping: Map[String, String] = DefaultSubstances,
      categoriesMapping: Map[String, String] = DefaultCategories): (RegularGrid, DataFrame) = {
    val pattern =
      (s"CAMS-REG-ANT_EUR_0\\.05x0\\.1_anthro_(\\w+)_v6\\.1-Ref2_yearly_$year\\.nc").r
    val d = new java.io.File(dir)
    require(d.isDirectory, s"Profiles directory $dir is not a directory.")
    val files = d.listFiles().toSeq
      .flatMap(f => f.getName match {
        case pattern(sub) => Some((f, sub))
        case _ => None
      }).sortBy(_._2)
    require(files.nonEmpty,
      s"No .nc files found matching the pattern '$pattern' in $dir")

    var grid: Option[RegularGrid] = None
    val rows = scala.collection.mutable.ListBuffer.empty[(Long, String, String, Double)]
    files.foreach { case (file, subCams) =>
      val subName = substancesMapping.getOrElse(subCams,
        throw new IllegalArgumentException(
          s"No substance mapping found for $subCams"))
      val bytes = java.nio.file.Files.readAllBytes(file.toPath)
      // container-independent: classic CDF-1/2 or NetCDF-4/HDF5 dispatch
      val f = NcAdapter.open(bytes)
      val lats = f.doubles("lat")
      val lons = f.doubles("lon")
      if (grid.isEmpty) {
        val (ymin, dy) = NetcdfRaster.regularAxis(lats)
        val (xmin, dx) = NetcdfRaster.regularAxis(lons)
        grid = Some(RegularGrid(lons.length, lats.length, xmin, ymin, dx, dy))
      }
      val nLat = lats.length; val nLon = lons.length
      categoriesMapping.toSeq.sortBy(_._1).foreach { case (varName, cat) =>
        require(f.hasVar(varName),
          s"Category $varName not found in the file ${file.getName}.")
        val units = f.attText(varName, "units")
        require(units == "Tg", s"Units are $units, expected Tg")
        val shape = f.shape(varName)
        val core = shape match { // yearly files: optional time=1 dim
          case Seq(1, a, b) => Seq(a, b)
          case s => s
        }
        require(core == Seq(nLat, nLon),
          s"$varName: expected (lat, lon), got $shape")
        val data = f.doubles(varName)
        var i = 0
        while (i < nLat) {
          var j = 0
          while (j < nLon) {
            val x = data(i * nLon + j)
            if (!x.isNaN && x != 0.0)
              rows += ((j.toLong * nLat + i, cat, subName, x * TgToKg))
            j += 1
          }
          i += 1
        }
      }
    }
    (grid.get, spark.createDataFrame(rows.toSeq)
      .toDF("cell_id", "category", "substance", "value"))
  }
}
