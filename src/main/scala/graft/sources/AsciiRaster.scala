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
  * distributedly: each text line carries its row index via the two-phase
  * per-partition numbering in [[numberedLines]] (text splits preserve
  * file order; no RDD hop, no global window). Output is the engine's
  * long cell format on a [[RegularGrid]] with x-major cell ids, NODATA
  * dropped.
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

  /** DataFrame-native line numbering: `(row, line)` in file order via
    * per-partition row_number + a bounded per-partition-count collect
    * (one row per split) — the same two-phase global-rank shape as
    * `Profiles.denseIdsByVec`, replacing the RDD `zipWithIndex` hop.
    * Text splits preserve file order and `monotonically_increasing_id`
    * is ascending within a partition, so (partition, mid) sorts lines
    * exactly as the file does. */
  private def numberedLines(spark: SparkSession, path: String) = {
    import org.apache.spark.sql.expressions.Window
    val raw = graft.Caching.cache(spark.read.text(path)
      .select(col("value").as("line"),
        spark_partition_id().as("_pid"),
        monotonically_increasing_id().as("_mid")))
    val counts = raw.groupBy("_pid").agg(count(lit(1)).as("_cnt"))
      .orderBy("_pid").collect()
    var acc = 0L
    val offsets = counts.toSeq.map { r =>
      val o = (r.getInt(0), acc); acc += r.getLong(1); o
    }
    val offDf = spark.createDataFrame(offsets).toDF("_pid", "_off")
    val w = Window.partitionBy("_pid").orderBy("_mid")
    raw
      .withColumn("_rn", row_number().over(w) - 1)
      .join(broadcast(offDf), "_pid")
      .select((col("_off") + col("_rn")).as("row"), col("line"))
  }

  /** Read one `.asc` file into `(cell_id, value)` on [[grid]]. */
  def read(spark: SparkSession, path: String): (RegularGrid, DataFrame) = {
    val headerLines = spark.read.textFile(path).take(6).toSeq
    val h = parseHeader(headerLines)
    val nHeader = headerLines.takeWhile(isHeaderLine).length.toLong
    val g = grid(h)
    val rows = numberedLines(spark, path)
      .where(col("row") >= nHeader)
      .select((col("row") - nHeader).as("row"), col("line"))
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
