package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Minimal pure-JVM reader for the ESRI File Geodatabase table format
  * (`.gdbtable` + `.gdbtablx`), the container of the reference's
  * MapLuftZurich inventory (`mapLuft_*.gdb`,
  * emiproc/inventories/zurich/__init__.py:18-117 via fiona/OGR). The
  * byte layout follows the publicly documented reverse-engineered FGDB
  * spec (the basis of OGR's openfilegdb driver): little-endian
  * throughout, 7-bit varuints, sign-bit-in-bit-6 varsints,
  * origin/scale-quantized delta-encoded coordinates.
  *
  * Scope (documented subset — enough for inventory vector layers):
  *  - V10 tables (field-descriptor version 4), format 3 magic;
  *  - field types: int32 (1), float64 (3), string (4), objectid (6),
  *    geometry (7) — geometry must be the LAST field (the descriptor
  *    tail after the bbox is version-variable; parsing stops there);
  *  - shape types: point (1), polyline (3), polygon (5), single- and
  *    multi-part, no Z/M;
  *  - `.gdbtablx` row offsets with all rows present.
  *
  * Environment caveat (FIXTURES.md §7): no real `.gdb` can be downloaded
  * here, so conformance is proven byte-level against fixtures authored
  * by an independent writer implementation of the same public spec
  * (GdbFixtures), exactly like the NetCDF classic and shapefile readers.
  */
object FileGdb {

  final case class GeomMeta(xorigin: Double, yorigin: Double, xyscale: Double)
  final case class GdbField(
      name: String, ftype: Int, nullable: Boolean, geom: Option[GeomMeta])
  /** One part list per ring/part; x and y parallel. */
  final case class Shape(shapeType: Int, xs: Seq[Seq[Double]], ys: Seq[Seq[Double]])

  // field type codes (spec table)
  val TInt32 = 1; val TFloat64 = 3; val TString = 4
  val TObjectId = 6; val TGeometry = 7

  private def varuint(b: ByteBuffer): Long = {
    var shift = 0; var v = 0L
    var more = true
    while (more) {
      val x = b.get() & 0xFF
      v |= (x & 0x7FL) << shift
      shift += 7
      more = (x & 0x80) != 0
    }
    v
  }

  /** FGDB signed varint: first byte carries sign in bit 6 and 6 value
    * bits; continuation bytes carry 7 bits each. */
  private def varsint(b: ByteBuffer): Long = {
    val first = b.get() & 0xFF
    val neg = (first & 0x40) != 0
    var v = (first & 0x3FL)
    var shift = 6
    var more = (first & 0x80) != 0
    while (more) {
      val x = b.get() & 0xFF
      v |= (x & 0x7FL) << shift
      shift += 7
      more = (x & 0x80) != 0
    }
    if (neg) -v else v
  }

  private def utf16(b: ByteBuffer, nChars: Int): String = {
    val chars = new Array[Char](nChars)
    (0 until nChars).foreach(i => chars(i) = b.getChar())
    new String(chars)
  }

  /** Parse the field-descriptor section; returns fields in order. */
  private[sources] def readFields(b: ByteBuffer): Seq[GdbField] = {
    /* int32 descLen */ b.getInt()
    val version = b.getInt() & 0xFF
    require(version == 4, s"only V10 tables (descriptor version 4), got $version")
    /* geometry type + 3 flag bytes */ b.getInt()
    val nFields = b.getShort() & 0xFFFF
    (0 until nFields).map { _ =>
      val name = utf16(b, b.get() & 0xFF)
      /* alias */ utf16(b, b.get() & 0xFF)
      val t = b.get() & 0xFF
      t match {
        case TObjectId =>
          /* width */ b.get(); /* flag */ b.get()
          GdbField(name, t, nullable = false, None)
        case TInt32 | TFloat64 =>
          /* width */ b.get()
          val flag = b.get() & 0xFF
          val defLen = b.get() & 0xFF
          b.position(b.position() + defLen)
          GdbField(name, t, (flag & 1) != 0, None)
        case TString =>
          /* max length */ b.getInt()
          val flag = b.get() & 0xFF
          val defLen = varuint(b).toInt
          b.position(b.position() + defLen)
          GdbField(name, t, (flag & 1) != 0, None)
        case TGeometry =>
          /* unknown byte */ b.get()
          val flag = b.get() & 0xFF
          val wktBytes = b.getShort() & 0xFFFF
          b.position(b.position() + wktBytes) // WKT of the SRS, UTF-16
          /* zm flags */ b.get()
          val xorigin = b.getDouble(); val yorigin = b.getDouble()
          val xyscale = b.getDouble()
          /* xytolerance */ b.getDouble()
          /* xmin,ymin,xmax,ymax */ (0 until 4).foreach(_ => b.getDouble())
          // version-variable spatial-grid tail follows; geometry is
          // required to be the last field, so stop consuming here.
          GdbField(name, t, (flag & 1) != 0, Some(GeomMeta(xorigin, yorigin, xyscale)))
        case other =>
          throw new IllegalArgumentException(s"unsupported field type $other ($name)")
      }
    }
  }

  private def decodeShape(bytes: Array[Byte], m: GeomMeta): Shape = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val st = varuint(b).toInt
    st match {
      case 1 => // point
        val vx = varuint(b); val vy = varuint(b)
        require(vx != 0 && vy != 0, "empty point")
        Shape(1,
          Seq(Seq((vx - 1).toDouble / m.xyscale + m.xorigin)),
          Seq(Seq((vy - 1).toDouble / m.xyscale + m.yorigin)))
      case 3 | 5 => // polyline / polygon
        val nPoints = varuint(b).toInt
        if (nPoints == 0) return Shape(st, Nil, Nil)
        val nParts = varuint(b).toInt
        /* bbox: xmin, ymin, dx, dy (scaled varuints) */
        (0 until 4).foreach(_ => varuint(b))
        val counts = new Array[Int](nParts)
        var acc = 0
        (0 until nParts - 1).foreach { i =>
          counts(i) = varuint(b).toInt; acc += counts(i)
        }
        counts(nParts - 1) = nPoints - acc
        var px = 0L; var py = 0L
        val xsAll = new Array[Double](nPoints)
        val ysAll = new Array[Double](nPoints)
        (0 until nPoints).foreach { i =>
          px += varsint(b); xsAll(i) = px.toDouble / m.xyscale + m.xorigin
        }
        (0 until nPoints).foreach { i =>
          py += varsint(b); ysAll(i) = py.toDouble / m.xyscale + m.yorigin
        }
        val bounds = counts.scanLeft(0)(_ + _)
        Shape(st,
          (0 until nParts).map(p => xsAll.slice(bounds(p), bounds(p + 1)).toSeq),
          (0 until nParts).map(p => ysAll.slice(bounds(p), bounds(p + 1)).toSeq))
      case other =>
        throw new IllegalArgumentException(s"unsupported shape type $other")
    }
  }

  /** Low-level table read: (fields, rows). A row maps field name →
    * Long (int32/oid) | Double | String | Shape | null. */
  def readTable(tablePath: String): (Seq[GdbField], Seq[Map[String, Any]]) = {
    val t = ByteBuffer.wrap(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(tablePath))).order(ByteOrder.LITTLE_ENDIAN)
    require(t.getInt() == 3, s"$tablePath: bad .gdbtable magic")
    val nRowsValid = t.getInt()
    t.position(32)
    val fieldDescOffset = t.getLong()
    t.position(fieldDescOffset.toInt)
    val fields = readFields(t)

    val xPath = tablePath.stripSuffix(".gdbtable") + ".gdbtablx"
    val x = ByteBuffer.wrap(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(xPath))).order(ByteOrder.LITTLE_ENDIAN)
    require(x.getInt() == 3, s"$xPath: bad .gdbtablx magic")
    /* n1024Blocks */ x.getInt()
    val nRows = x.getInt()
    val offSize = x.getInt()
    def rowOffset(i: Int): Long = {
      x.position(16 + i * offSize)
      var v = 0L
      (0 until offSize).foreach(k => v |= (x.get() & 0xFFL) << (8 * k))
      v
    }

    val nullable = fields.filter(_.nullable)
    val rows = (0 until nRows).flatMap { i =>
      val off = rowOffset(i)
      if (off == 0) None
      else {
        t.position(off.toInt)
        /* rowLen */ t.getInt()
        val nullBytes = (nullable.size + 7) / 8
        val bitmap = new Array[Byte](nullBytes)
        t.get(bitmap)
        var nullIdx = 0
        val vals = fields.map { f =>
          val isNull = f.nullable && {
            val bit = (bitmap(nullIdx / 8) >> (nullIdx % 8) & 1) != 0
            nullIdx += 1
            bit
          }
          val v: Any =
            if (isNull) null
            else f.ftype match {
              case TObjectId => (i + 1).toLong // implicit, not stored
              case TInt32 => t.getInt().toLong
              case TFloat64 => t.getDouble()
              case TString =>
                val n = varuint(t).toInt
                val s = new Array[Byte](n); t.get(s); new String(s, "UTF-8")
              case TGeometry =>
                val n = varuint(t).toInt
                val g = new Array[Byte](n); t.get(g)
                decodeShape(g, f.geom.get)
            }
          f.name -> v
        }
        Some(vals.toMap)
      }
    }
    require(rows.size == nRowsValid, s"$tablePath: ${rows.size} rows != $nRowsValid")
    (fields, rows)
  }

  /** Layer listing from the GDB_SystemCatalog (`a00000001.gdbtable`):
    * ObjectID → table file `a%08x.gdbtable`; system tables (`GDB_*`)
    * excluded. Mirrors `fiona.listlayers` /
    * `emiproc.inventories.utils.list_categories`. */
  def listLayers(gdbDir: String): Seq[(Long, String)] = {
    val (fields, rows) = readTable(s"$gdbDir/a00000001.gdbtable")
    val oid = fields.find(_.ftype == TObjectId)
      .getOrElse(throw new IllegalArgumentException("catalog has no ObjectID"))
      .name
    rows.flatMap { r =>
      val name = r("Name").asInstanceOf[String]
      if (name.startsWith("GDB_")) None
      else Some((r(oid).asInstanceOf[Long], name))
    }
  }

  /** Read one named layer as a DataFrame: attribute columns by field
    * name (int32/oid → long, float64 → double, string → string) plus the
    * exploded geometry `(geom_type, part, xs, ys)` — multi-part shapes
    * become one row per part, plugging straight into the engine's
    * `(xs, ys)` polygon machinery and `bufferLines`. */
  def readLayer(spark: SparkSession, gdbDir: String, layer: String): DataFrame = {
    val id = listLayers(gdbDir).collectFirst { case (i, n) if n == layer => i }
      .getOrElse(throw new NoSuchElementException(s"layer $layer not in $gdbDir"))
    val (fields, rows) = readTable(f"$gdbDir/a$id%08x.gdbtable")
    val attrFields = fields.filter(_.ftype != TGeometry)
    val geomField = fields.find(_.ftype == TGeometry)
    val schema = StructType(
      attrFields.map(f => StructField(f.name, f.ftype match {
        case TString => StringType
        case TFloat64 => DoubleType
        case _ => LongType
      })) ++ Seq(
        StructField("geom_type", IntegerType),
        StructField("part", IntegerType),
        StructField("xs", ArrayType(DoubleType)),
        StructField("ys", ArrayType(DoubleType))))
    val data = rows.flatMap { r =>
      val attrs = attrFields.map(f => r(f.name))
      geomField.map(g => r(g.name)) match {
        case Some(s: Shape) if s.xs.nonEmpty =>
          s.xs.indices.map(p => org.apache.spark.sql.Row.fromSeq(
            attrs ++ Seq(s.shapeType, p, s.xs(p), s.ys(p))))
        case _ =>
          Seq(org.apache.spark.sql.Row.fromSeq(attrs ++ Seq(null, null, null, null)))
      }
    }
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava), schema)
  }
}
