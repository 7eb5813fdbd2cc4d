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

  private val HeaderKeys = Set(
    "ncols", "nrows", "xllcorner", "yllcorner", "xllcenter", "yllcenter",
    "cellsize", "nodata_value")

  /** A line is a header line iff its first token is a known Esri ASCII
    * header key — NODATA_value is OPTIONAL in the format, so counting
    * lines (always 6) would silently eat the first data row of a 5-line
    * header file. */
  private[sources] def isHeaderLine(line: String): Boolean = {
    val tok = line.trim.split("\\s+")
    tok.length == 2 && HeaderKeys.contains(tok(0).toLowerCase)
  }

  private[sources] def parseHeader(lines: Seq[String]): Header = {
    val kv = lines.takeWhile(isHeaderLine)
      .map(_.trim.split("\\s+")).map(a => a(0).toLowerCase -> a(1)).toMap
    // xllcenter form: corner = center - cellsize/2 (Esri ASCII spec)
    val cs = kv("cellsize").toDouble
    val xll = kv.get("xllcorner").map(_.toDouble)
      .getOrElse(kv("xllcenter").toDouble - cs / 2)
    val yll = kv.get("yllcorner").map(_.toDouble)
      .getOrElse(kv("yllcenter").toDouble - cs / 2)
    Header(
      kv("ncols").toInt, kv("nrows").toInt,
      xll, yll, cs,
      kv.getOrElse("nodata_value", "-9999").toDouble)
  }

  def grid(h: Header): RegularGrid =
    RegularGrid(h.ncols, h.nrows, h.xllcorner, h.yllcorner, h.cellsize, h.cellsize)

  /** Read one `.asc` file into `(cell_id, value)` on [[grid]]. */
  def read(spark: SparkSession, path: String): (RegularGrid, DataFrame) = {
    val headerLines = spark.read.textFile(path).take(6).toSeq
    val h = parseHeader(headerLines)
    val nHeader = headerLines.takeWhile(isHeaderLine).length.toLong
    val g = grid(h)
    val indexed = spark.sparkContext.textFile(path)
      .zipWithIndex()
      .filter(_._2 >= nHeader)
      .map { case (line, i) => (i - nHeader, line) } // data row r: top row first
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
