package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.RegularGrid

/** Esri ASCII grid reader — the spatial-distribution rasters of the Swiss
  * inventory path (reference emiproc/inventories/swiss.py:34-420 reads
  * `.asc` rasters via rasterio; same header contract: ncols/nrows/
  * xllcorner/yllcorner/cellsize/NODATA_value, then nrows lines of ncols
  * values, row 0 = TOP row).
  *
  * The header is parsed on the driver (6 lines); the data block parses
  * distributedly: each text line carries its row index via
  * `monotonically…`-free line numbering from a zipWithIndex on the text
  * RDD (deterministic: text files preserve line order per split).
  * Output is the engine's long cell format on a [[RegularGrid]] with
  * x-major cell ids, NODATA dropped.
  */
object AsciiRaster {

  final case class Header(
      ncols: Int, nrows: Int,
      xllcorner: Double, yllcorner: Double,
      cellsize: Double, nodata: Double)

  private[sources] def parseHeader(lines: Seq[String]): Header = {
    val kv = lines.map(_.trim.split("\\s+")).map(a => a(0).toLowerCase -> a(1)).toMap
    Header(
      kv("ncols").toInt, kv("nrows").toInt,
      kv("xllcorner").toDouble, kv("yllcorner").toDouble,
      kv("cellsize").toDouble,
      kv.getOrElse("nodata_value", "-9999").toDouble)
  }

  def grid(h: Header): RegularGrid =
    RegularGrid(h.ncols, h.nrows, h.xllcorner, h.yllcorner, h.cellsize, h.cellsize)

  /** Read one `.asc` file into `(cell_id, value)` on [[grid]]. */
  def read(spark: SparkSession, path: String): (RegularGrid, DataFrame) = {
    val headerLines = spark.read.textFile(path).take(6).toSeq
    val h = parseHeader(headerLines)
    val g = grid(h)
    val indexed = spark.sparkContext.textFile(path)
      .zipWithIndex()
      .filter(_._2 >= 6)
      .map { case (line, i) => (i - 6, line) } // data row r: top row first
    val rows = spark.createDataFrame(indexed).toDF("row", "line")
    val df = rows
      .select(col("row"), posexplode(split(trim(col("line")), "\\s+")))
      .select(
        col("row"), col("pos").as("ix"),
        col("col").cast("double").as("value"))
      .where(col("value") =!= h.nodata)
      // row 0 is the TOP row: iy = nrows - 1 - row ; cell_id x-major
      .select(
        (col("ix").cast("long") * g.ny + (lit(g.ny - 1) - col("row"))).as("cell_id"),
        col("value"))
    (g, df)
  }
}
