package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.RegularGrid

/** TNO inventory loader — reference `TNO_Inventory`
  * (emiproc/inventories/tno.py:30-402) over the container-independent
  * [[NcAdapter]] (classic CDF-1/2 via [[NetcdfClassic]], NetCDF-4/HDF5
  * via [[Hdf5Classic]] — dispatched on the magic). The TNO layout:
  *
  *  - `longitude`/`latitude` coordinate vars → the (regular) TNOGrid;
  *  - a `source` dimension with per-source vars: `longitude_index`/
  *    `latitude_index` (1-BASED cell indexes, tno.py:208-210),
  *    `source_type_index` into `source_type_code` ('a' = area,
  *    'p' = point, tno.py:145-162), `emission_category_index` into
  *    `emis_cat_code` (tno.py:163-165), and for point sources
  *    `longitude_source`/`latitude_source`;
  *  - one variable per substance, recognized by a `long_name` attribute
  *    starting with "emission of" (tno.py:167-172), merged through
  *    `substancesMapping` (e.g. co2_ff + co2_bf → CO2, tno.py:62-70).
  *
  * Outputs the engine's long formats: gridded area emissions
  * `(cell_id, category, substance, value)` with the reference's x-major
  * `cell_id = (lon_idx−1)·ny + (lat_idx−1)` (tno.py:208-210), and point
  * sources `(x, y, category, substance, value)`. Source rows are
  * grid-scale (≪ fact tables): the file decodes on the driver and the
  * mapping merge runs as a Spark aggregate.
  */
object TnoLoader {

  val DefaultMapping: Map[String, String] = Map(
    "co2_ff" -> "CO2", "co2_bf" -> "CO2",
    "co_ff" -> "CO", "co_bf" -> "CO",
    "nox" -> "NOx", "ch4" -> "CH4", "nmvoc" -> "VOC")

  final case class TnoInventory(
      grid: RegularGrid, area: DataFrame, points: DataFrame)

  def read(
      spark: SparkSession,
      path: String,
      substancesMapping: Map[String, String] = DefaultMapping): TnoInventory = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    // container-independent: classic CDF-1/2 or NetCDF-4/HDF5 dispatch
    val f = NcAdapter.open(bytes)

    val lons = f.doubles("longitude")
    val lats = f.doubles("latitude")
    val (xmin, dx) = NetcdfRaster.regularAxis(lons)
    val (ymin, dy) = NetcdfRaster.regularAxis(lats)
    val grid = RegularGrid(lons.length, lats.length, xmin, ymin, dx, dy)

    val typeCodes = f.strings("source_type_code")
    typeCodes.foreach(t => require(t == "a" || t == "p",
      s"Unknown source_type_code $t (tno.py:155)"))
    val catCodes = f.strings("emis_cat_code")

    val lonIdx = f.doubles("longitude_index")
    val latIdx = f.doubles("latitude_index")
    val typeIdx = f.doubles("source_type_index")
    val catIdx = f.doubles("emission_category_index")
    val n = typeIdx.length

    // substance variables: long_name starts with "emission of"
    val fileSubs = f.varNames.filter(v =>
      f.attText(v, "long_name").startsWith("emission of"))
    val wanted = fileSubs.filter(substancesMapping.contains)
    val missing = substancesMapping.keySet -- fileSubs.toSet
    require(missing.isEmpty,
      s"Substances $missing in the mapping are not in the nc file (tno.py:186-191)")
    val subData = wanted.map(s => s -> f.doubles(s)).toMap

    val isPoint = (i: Int) => typeCodes(typeIdx(i).toInt - 1) == "p"
    val areaRows = for {
      i <- 0 until n if !isPoint(i)
      s <- wanted
      v = subData(s)(i) if !v.isNaN && v != 0.0
    } yield (
      (lonIdx(i).toLong - 1) * grid.ny + (latIdx(i).toLong - 1),
      catCodes(catIdx(i).toInt - 1), substancesMapping(s), v)

    val (pLon, pLat) =
      if ((0 until n).exists(isPoint))
        (f.doubles("longitude_source"), f.doubles("latitude_source"))
      else (Array.empty[Double], Array.empty[Double])
    val pointRows = for {
      i <- 0 until n if isPoint(i)
      s <- wanted
      v = subData(s)(i) if !v.isNaN && v != 0.0
    } yield (pLon(i), pLat(i), catCodes(catIdx(i).toInt - 1), substancesMapping(s), v)

    // merge mapped substances (co2_ff + co2_bf -> CO2) as an aggregate
    val area = spark.createDataFrame(areaRows.toSeq)
      .toDF("cell_id", "category", "substance", "value")
      .groupBy("cell_id", "category", "substance")
      .agg(sum("value").as("value"))
    val points = spark.createDataFrame(pointRows.toSeq)
      .toDF("x", "y", "category", "substance", "value")
      .groupBy("x", "y", "category", "substance")
      .agg(sum("value").as("value"))
    TnoInventory(grid, area, points)
  }
}
