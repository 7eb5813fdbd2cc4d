package graft

import java.nio.{ByteBuffer, ByteOrder}

/** Byte-level FileGDB fixture builder — an INDEPENDENT writer of the
  * same public reverse-engineered spec the reader implements
  * ([[graft.sources.FileGdb]]): V10 `.gdbtable` + `.gdbtablx` pairs with
  * int32/float64/string/objectid/geometry fields and
  * point/polyline/polygon shape buffers (origin/scale quantization,
  * delta varsints). */
object GdbFixtures {

  sealed trait FVal
  case object FNull extends FVal
  final case class FInt(v: Int) extends FVal
  final case class FDouble(v: Double) extends FVal
  final case class FString(v: String) extends FVal
  /** shapeType 1 point / 3 polyline / 5 polygon; parts of (x, y). */
  final case class FShape(shapeType: Int, parts: Seq[Seq[(Double, Double)]]) extends FVal

  final case class FField(
      name: String, ftype: Int, nullable: Boolean = false,
      xorigin: Double = -400.0, yorigin: Double = -400.0, xyscale: Double = 1e4)

  private def vu(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    var more = true
    while (more) {
      val x = (v & 0x7F).toInt
      v >>>= 7
      more = v != 0
      out.write(if (more) x | 0x80 else x)
    }
  }

  private def vs(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    val neg = v0 < 0
    var v = math.abs(v0)
    var first = (v & 0x3F).toInt | (if (neg) 0x40 else 0)
    v >>>= 6
    if (v != 0) first |= 0x80
    out.write(first)
    while (v != 0) {
      val x = (v & 0x7F).toInt
      v >>>= 7
      out.write(if (v != 0) x | 0x80 else x)
    }
  }

  private def utf16(out: java.io.ByteArrayOutputStream, s: String): Unit =
    s.foreach { c => out.write(c & 0xFF); out.write((c >> 8) & 0xFF) }

  private def shapeBuffer(f: FField, s: FShape): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def sx(x: Double) = math.round((x - f.xorigin) * f.xyscale)
    def sy(y: Double) = math.round((y - f.yorigin) * f.xyscale)
    vu(out, s.shapeType)
    s.shapeType match {
      case 1 =>
        val (x, y) = s.parts.head.head
        vu(out, sx(x) + 1); vu(out, sy(y) + 1)
      case 3 | 5 =>
        val pts = s.parts.flatten
        vu(out, pts.size); vu(out, s.parts.size)
        val xs = pts.map(p => sx(p._1)); val ys = pts.map(p => sy(p._2))
        vu(out, xs.min); vu(out, ys.min)
        vu(out, xs.max - xs.min); vu(out, ys.max - ys.min)
        s.parts.dropRight(1).foreach(p => vu(out, p.size))
        var prev = 0L
        xs.foreach { v => vs(out, v - prev); prev = v }
        prev = 0L
        ys.foreach { v => vs(out, v - prev); prev = v }
    }
    out.toByteArray
  }

  /** Build a (.gdbtable, .gdbtablx) pair. `rows` are per-field values in
    * field order; ObjectID fields take no stored value (pass FNull). */
  def buildTable(
      fields: Seq[FField],
      rows: Seq[Seq[FVal]]): (Array[Byte], Array[Byte]) = {
    import graft.sources.FileGdb._

    // ---- field descriptor section
    val fd = new java.io.ByteArrayOutputStream()
    val fdb = new java.io.DataOutputStream(fd)
    def le16(v: Int) = { fd.write(v & 0xFF); fd.write((v >> 8) & 0xFF) }
    def le32(v: Int) = { le16(v & 0xFFFF); le16((v >> 16) & 0xFFFF) }
    def leDouble(v: Double) = {
      val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      bb.putDouble(v); fd.write(bb.array())
    }
    le32(4) // version 4 = V10
    le32(if (fields.exists(_.ftype == TGeometry)) 3 else 0) // geom type + flags
    le16(fields.size)
    fields.foreach { f =>
      fd.write(f.name.length); utf16(fd, f.name)
      fd.write(0) // no alias
      fd.write(f.ftype)
      f.ftype match {
        case TObjectId => fd.write(4); fd.write(2)
        case TInt32 => fd.write(4); fd.write(if (f.nullable) 1 else 0); fd.write(0)
        case TFloat64 => fd.write(8); fd.write(if (f.nullable) 1 else 0); fd.write(0)
        case TString =>
          le32(1000); fd.write(if (f.nullable) 1 else 0); fd.write(0) // varuint 0
        case TGeometry =>
          fd.write(0); fd.write(if (f.nullable) 1 else 0)
          le16(0) // empty SRS WKT
          fd.write(0) // no z/m
          leDouble(f.xorigin); leDouble(f.yorigin); leDouble(f.xyscale)
          leDouble(1.0 / f.xyscale) // xytolerance
          Seq(-400.0, -400.0, 400.0, 400.0).foreach(leDouble) // bbox
      }
    }
    fdb.flush()
    val fieldBytes = fd.toByteArray

    // ---- rows
    val nullable = fields.filter(_.nullable)
    val rowBlobs = rows.map { vals =>
      val out = new java.io.ByteArrayOutputStream()
      val bitmap = new Array[Byte]((nullable.size + 7) / 8)
      var nullIdx = 0
      val body = new java.io.ByteArrayOutputStream()
      fields.zip(vals).foreach { case (f, v) =>
        if (f.nullable) {
          if (v == FNull) bitmap(nullIdx / 8) =
            (bitmap(nullIdx / 8) | (1 << (nullIdx % 8))).toByte
          nullIdx += 1
        }
        (f.ftype, v) match {
          case (TObjectId, _) | (_, FNull) => ()
          case (TInt32, FInt(i)) =>
            val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
            bb.putInt(i); body.write(bb.array())
          case (TFloat64, FDouble(d)) =>
            val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
            bb.putDouble(d); body.write(bb.array())
          case (TString, FString(s)) =>
            val b = s.getBytes("UTF-8"); vu(body, b.length); body.write(b)
          case (TGeometry, s: FShape) =>
            val b = shapeBuffer(f, s); vu(body, b.length); body.write(b)
          case (t, other) =>
            throw new IllegalArgumentException(s"bad value $other for type $t")
        }
      }
      val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(bitmap.length + body.size())
      out.write(bb.array()); out.write(bitmap); out.write(body.toByteArray)
      out.toByteArray
    }

    // ---- assemble .gdbtable
    val table = new java.io.ByteArrayOutputStream()
    val hb = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
    hb.putInt(3) // magic
    hb.putInt(rows.size)
    hb.putInt(0); hb.putInt(5) // unknown header words
    hb.putLong(0) // bytes 16-23 (unknown)
    hb.putLong(0) // bytes 24-31 (file size, not checked)
    hb.putLong(40) // bytes 32-39: field descriptor offset
    table.write(hb.array())
    val lb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
    lb.putInt(fieldBytes.length)
    table.write(lb.array()); table.write(fieldBytes)
    val offsets = rowBlobs.map { blob =>
      val off = table.size(); table.write(blob); off
    }

    // ---- .gdbtablx
    val x = new java.io.ByteArrayOutputStream()
    val xb = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    xb.putInt(3); xb.putInt(1); xb.putInt(rows.size); xb.putInt(4)
    x.write(xb.array())
    offsets.foreach { o =>
      val ob = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      ob.putInt(o); x.write(ob.array())
    }
    (table.toByteArray, x.toByteArray)
  }

  /** Write a whole minimal `.gdb` directory: the system catalog at
    * `a00000001` plus one table file per layer (ObjectID = row number). */
  def buildGdb(
      dir: java.nio.file.Path,
      layers: Seq[(String, Seq[FField], Seq[Seq[FVal]])]): Unit = {
    import graft.sources.FileGdb._
    java.nio.file.Files.createDirectories(dir)
    val catFields = Seq(
      FField("ObjectID", TObjectId), FField("Name", TString),
      FField("FileFormat", TInt32))
    val sysRows = Seq("GDB_SystemCatalog", "GDB_DBTune", "GDB_SpatialRefs")
    val catRows = (sysRows ++ layers.map(_._1)).map(n =>
      Seq(FNull, FString(n), FInt(0)))
    val (cat, catx) = buildTable(catFields, catRows)
    java.nio.file.Files.write(dir.resolve("a00000001.gdbtable"), cat)
    java.nio.file.Files.write(dir.resolve("a00000001.gdbtablx"), catx)
    layers.zipWithIndex.foreach { case ((_, fields, rows), i) =>
      val id = sysRows.size + i + 1 // ObjectID of the catalog row
      val (t, tx) = buildTable(fields, rows)
      java.nio.file.Files.write(dir.resolve(f"a$id%08x.gdbtable"), t)
      java.nio.file.Files.write(dir.resolve(f"a$id%08x.gdbtablx"), tx)
    }
  }
}
