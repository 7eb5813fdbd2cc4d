package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pure-JVM ESRI Shapefile (.shp + .dbf) reader — the public format pair
  * behind the reference's Natural-Earth country path
  * (`get_natural_earth` → `get_country_mask`,
  * emiproc/utilities.py:263-531 reads `admin_0_countries` and keys
  * polygons by the ISO_A3 attribute). With this, real country polygons
  * flow into [[graft.ops.SpatialJoin.polygonMask]] with no geo library.
  *
  * .shp: 100-byte header (magic 9994 BE, shape type LE), records of
  * (recnum BE, length BE) + Polygon(5)/PolyLine(3) content: bbox,
  * numParts, numPoints, part offsets, (x, y) doubles LE. Ring
  * orientation per spec: outer rings clockwise, holes counter-clockwise
  * — holes are flagged, not subtracted (the engine's polygon model is
  * hole-free; a hole-aware weight is outer − holes via two passes).
  *
  * .dbf: dBase III — 32-byte header (record count, header/record
  * sizes), 32-byte field descriptors to 0x0D, fixed-width ASCII
  * records with a leading deletion byte.
  *
  * Files parse on the driver (Natural Earth 110m is ~177 countries);
  * the vertex arrays land in a DataFrame immediately.
  */
object Shapefile {

  final case class Ring(xs: Array[Double], ys: Array[Double]) {
    /** signed shoelace area: negative = clockwise = OUTER ring. */
    def signedArea: Double = {
      var a = 0.0
      var i = 0
      val n = xs.length
      while (i < n) {
        val j = (i + 1) % n
        a += xs(i) * ys(j) - xs(j) * ys(i)
        i += 1
      }
      a / 2.0
    }
    def isHole: Boolean = signedArea > 0
  }
  final case class ShpShape(recordId: Int, rings: Seq[Ring])

  def readShp(bytes: Array[Byte]): Seq[ShpShape] = {
    val b = ByteBuffer.wrap(bytes)
    b.order(ByteOrder.BIG_ENDIAN)
    require(b.getInt(0) == 9994, "not a shapefile (bad magic)")
    val fileLenBytes = b.getInt(24).toLong * 2
    var pos = 100
    val out = scala.collection.mutable.ListBuffer.empty[ShpShape]
    while (pos + 8 <= fileLenBytes && pos + 8 <= bytes.length) {
      b.order(ByteOrder.BIG_ENDIAN)
      val recNum = b.getInt(pos)
      val contentLen = b.getInt(pos + 4) * 2
      val c = ByteBuffer.wrap(bytes, pos + 8, contentLen).order(ByteOrder.LITTLE_ENDIAN)
      val shapeType = c.getInt()
      shapeType match {
        case 0 => // null shape
        case 5 | 3 => // Polygon | PolyLine: same layout
          c.position(c.position() + 32) // bbox
          val numParts = c.getInt()
          val numPoints = c.getInt()
          val parts = (0 until numParts).map(_ => c.getInt())
          val xs = new Array[Double](numPoints)
          val ys = new Array[Double](numPoints)
          (0 until numPoints).foreach { i =>
            xs(i) = c.getDouble(); ys(i) = c.getDouble()
          }
          val rings = parts.zipWithIndex.map { case (start, pi) =>
            val end = if (pi + 1 < numParts) parts(pi + 1) else numPoints
            // shapefile rings repeat the first point at the end; drop it
            val n0 = end - start
            val n = if (n0 > 1 && xs(start) == xs(end - 1) && ys(start) == ys(end - 1)) n0 - 1 else n0
            Ring(
              java.util.Arrays.copyOfRange(xs, start, start + n),
              java.util.Arrays.copyOfRange(ys, start, start + n))
          }
          out += ShpShape(recNum, rings)
        case 1 => // Point: represent as a degenerate 1-vertex ring
          val x = c.getDouble(); val y = c.getDouble()
          out += ShpShape(recNum, Seq(Ring(Array(x), Array(y))))
        case other =>
          throw new IllegalArgumentException(s"unsupported shape type $other")
      }
      pos += 8 + contentLen
    }
    out.toSeq
  }

  final case class DbfField(name: String, fieldType: Char, length: Int)

  def readDbf(bytes: Array[Byte]): (Seq[DbfField], Seq[Seq[String]]) = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val numRecords = b.getInt(4)
    val headerSize = b.getShort(8).toInt
    val recordSize = b.getShort(10).toInt
    val fields = scala.collection.mutable.ListBuffer.empty[DbfField]
    var pos = 32
    while (pos < headerSize && bytes(pos) != 0x0D) {
      val nameBytes = java.util.Arrays.copyOfRange(bytes, pos, pos + 11)
      val name = new String(nameBytes, "ASCII").takeWhile(_ != 0).trim
      val t = bytes(pos + 11).toChar
      val len = bytes(pos + 16) & 0xFF
      fields += DbfField(name, t, len)
      pos += 32
    }
    val records = (0 until numRecords).map { r =>
      var off = headerSize + r * recordSize + 1 // skip deletion flag
      fields.toSeq.map { f =>
        val v = new String(bytes, off, f.length, "ASCII").trim
        off += f.length
        v
      }
    }
    (fields.toSeq, records)
  }

  /** Read polygons keyed by a .dbf attribute (e.g. ISO_A3) into
    * `(name, record_id, ring_id, is_hole, xs, ys)` — outer rings feed
    * [[graft.ops.SpatialJoin.polygonMask]] directly. */
  def readPolygons(
      spark: SparkSession,
      shpPath: String,
      dbfPath: String,
      attr: String): DataFrame = {
    val shapes = readShp(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(shpPath)))
    val (fields, records) = readDbf(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dbfPath)))
    val ai = fields.indexWhere(_.name.equalsIgnoreCase(attr))
    require(ai >= 0, s"attribute $attr not in dbf: ${fields.map(_.name)}")
    val rows = shapes.flatMap { s =>
      // shapefile records are 1-based and align with dbf row order
      val name = records(s.recordId - 1)(ai)
      s.rings.zipWithIndex.map { case (r, ri) =>
        (name, s.recordId, ri, r.isHole, r.xs.toSeq, r.ys.toSeq)
      }
    }
    spark.createDataFrame(rows)
      .toDF("name", "record_id", "ring_id", "is_hole", "xs", "ys")
  }

  /** Country polygons for the mask path: outer rings only, named by the
    * attribute — the shape `(country, xs, ys)` polygonMask expects. */
  def countryPolygons(
      spark: SparkSession, shpPath: String, dbfPath: String,
      attr: String = "ISO_A3"): DataFrame =
    readPolygons(spark, shpPath, dbfPath, attr)
      .where(!col("is_hole"))
      .select(col("name").as("country"), col("xs"), col("ys"))

  /** [[countryPolygons]] KEEPING interior rings, in the layout
    * [[graft.ops.SpatialJoin.polyGridWeightsRings]] consumes (ring 0 =
    * shell, 1 = hole) — enclave-correct country masks over real
    * shapefile data; reduces to the single-ring result when no shape
    * has holes. */
  def countryPolygonsWithRings(
      spark: SparkSession, shpPath: String, dbfPath: String,
      attr: String = "ISO_A3"): DataFrame =
    readPolygons(spark, shpPath, dbfPath, attr)
      .select(col("name").as("country"),
        when(col("is_hole"), lit(1)).otherwise(lit(0)).as("ring"),
        col("xs"), col("ys"))
}
