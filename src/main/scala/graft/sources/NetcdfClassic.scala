package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM reader for the NetCDF CLASSIC binary format (CDF-1 magic
  * `CDF\x01`, 32-bit offsets; CDF-2 magic `CDF\x02`, 64-bit offsets) —
  * the publicly documented Unidata file layout: header (dim list, global
  * attribute list, variable list) followed by big-endian data, non-record
  * variables contiguous at their `begin` offset, record variables
  * interleaved per record.
  *
  * This is the ingestion path the reference reaches via xarray/netCDF4
  * (emiproc/inventories/tno.py:30-402, edgarv8.py:32-137,
  * emiproc/raster_utils.py) for classic-format files. NetCDF-4 files are
  * HDF5 containers — a full HDF5 B-tree reader is out of scope without a
  * library (documented in FIXTURES.md); classic files, still the common
  * distribution format for inventory rasters, parse here with no
  * dependency.
  *
  * Driver-side by design: inventory raster HEADERS are tiny and the
  * coordinate/flux variables of a single file are grid-sized (≪ the fact
  * tables). The 100 TB path is many files × partitions: pair this parser
  * with `spark.read.format("binaryFile")` + `mapPartitions`, one file
  * per task — the parser itself is pure and serializable.
  */
object NetcdfClassic {

  // nc_type codes (classic spec)
  val NcByte = 1; val NcChar = 2; val NcShort = 3
  val NcInt = 4; val NcFloat = 5; val NcDouble = 6

  final case class NcDim(name: String, length: Int) {
    def isRecord: Boolean = length == 0
  }
  final case class NcAtt(name: String, ncType: Int, text: String, nums: Seq[Double])
  final case class NcVar(
      name: String, dimIds: Seq[Int], atts: Seq[NcAtt],
      ncType: Int, vsize: Int, begin: Long)
  final case class NcFile(
      version: Int, numrecs: Int,
      dims: Seq[NcDim], gatts: Seq[NcAtt], vars: Seq[NcVar]) {
    def dim(name: String): NcDim = dims.find(_.name == name)
      .getOrElse(throw new NoSuchElementException(s"dimension $name"))
    def variable(name: String): NcVar = vars.find(_.name == name)
      .getOrElse(throw new NoSuchElementException(s"variable $name"))
    /** shape of a variable with the record dim resolved to numrecs */
    def shape(v: NcVar): Seq[Int] =
      v.dimIds.map(i => if (dims(i).isRecord) numrecs else dims(i).length)
  }

  private def typeSize(t: Int): Int = t match {
    case NcByte | NcChar => 1
    case NcShort => 2
    case NcInt | NcFloat => 4
    case NcDouble => 8
    case other => throw new IllegalArgumentException(s"nc_type $other")
  }

  private def pad4(n: Int): Int = (n + 3) & ~3

  def readHeader(bytes: Array[Byte]): NcFile = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(b.get() == 'C' && b.get() == 'D' && b.get() == 'F',
      "not a NetCDF classic file (bad magic)")
    val version = b.get().toInt
    require(version == 1 || version == 2,
      s"classic CDF-1/CDF-2 only (got version byte $version; 5 = CDF-5, " +
        "HDF5-based NetCDF-4 starts with \\x89HDF)")
    val numrecs = b.getInt() // 0xFFFFFFFF = STREAMING; treated as 0 records known

    def readName(): String = {
      val n = b.getInt()
      val s = new Array[Byte](n)
      b.get(s)
      b.position(b.position() + (pad4(n) - n))
      new String(s, "UTF-8")
    }

    def readTaggedCount(expectedTag: Int): Int = {
      val tag = b.getInt()
      val count = b.getInt()
      require(tag == expectedTag || (tag == 0 && count == 0),
        s"bad list tag $tag (expected $expectedTag)")
      count
    }

    val ndims = readTaggedCount(0x0A)
    val dims = (0 until ndims).map(_ => NcDim(readName(), b.getInt()))

    def readAtts(): Seq[NcAtt] = {
      val natts = readTaggedCount(0x0C)
      (0 until natts).map { _ =>
        val name = readName()
        val t = b.getInt()
        val n = b.getInt()
        val raw = new Array[Byte](pad4(n * typeSize(t)))
        b.get(raw)
        val vb = ByteBuffer.wrap(raw).order(ByteOrder.BIG_ENDIAN)
        if (t == NcChar) NcAtt(name, t, new String(raw, 0, n, "UTF-8"), Nil)
        else {
          val nums = (0 until n).map(_ => t match {
            case NcByte => vb.get().toDouble
            case NcShort => vb.getShort().toDouble
            case NcInt => vb.getInt().toDouble
            case NcFloat => vb.getFloat().toDouble
            case NcDouble => vb.getDouble()
          })
          NcAtt(name, t, "", nums)
        }
      }
    }

    val gatts = readAtts()

    val nvars = readTaggedCount(0x0B)
    val vars = (0 until nvars).map { _ =>
      val name = readName()
      val nd = b.getInt()
      val dimIds = (0 until nd).map(_ => b.getInt())
      val atts = readAtts()
      val t = b.getInt()
      val vsize = b.getInt()
      val begin = if (version == 1) b.getInt().toLong else b.getLong()
      NcVar(name, dimIds, atts, t, vsize, begin)
    }
    NcFile(version, numrecs, dims, gatts, vars)
  }

  /** Decode a 2-D `(n, strlen)` NC_CHAR variable as n strings (trailing
    * NUL/space trimmed) — the layout TNO uses for `emis_cat_code` /
    * `source_type_code` (emiproc/inventories/tno.py:145-165). */
  def readVarStrings(bytes: Array[Byte], f: NcFile, name: String): Seq[String] = {
    val v = f.variable(name)
    require(v.ncType == NcChar, s"$name is not an NC_CHAR variable")
    val shape = f.shape(v)
    val (n, m) = shape match {
      case Seq(a, b) => (a, b)
      case Seq(a) => (a, 1)
      case other => throw new IllegalArgumentException(
        s"$name: unsupported char shape $other")
    }
    (0 until n).map { i =>
      new String(bytes, v.begin.toInt + i * m, m, "UTF-8")
        .takeWhile(_ != 0).trim
    }
  }

  /** Read a variable's full data as a flattened row-major Double array
    * (record dimension unrolled to numrecs), applying the CF
    * `scale_factor`/`add_offset` packing attributes if present and
    * mapping `_FillValue`/`missing_value` to NaN. */
  def readVarDoubles(bytes: Array[Byte], f: NcFile, name: String): Array[Double] = {
    val v = f.variable(name)
    val shape = f.shape(v)
    val n = shape.product
    val out = new Array[Double](n)
    val isRecord = v.dimIds.nonEmpty && f.dims(v.dimIds.head).isRecord
    val perRec = if (isRecord) shape.tail.product else n
    val recSize = if (isRecord)
      f.vars.filter(w => w.dimIds.nonEmpty && f.dims(w.dimIds.head).isRecord)
        .map(_.vsize.toLong).sum
    else 0L

    def readSlab(offset: Long, count: Int, into: Int): Unit = {
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
      b.position(offset.toInt)
      var i = 0
      while (i < count) {
        out(into + i) = v.ncType match {
          case NcByte => b.get().toDouble
          case NcShort => b.getShort().toDouble
          case NcInt => b.getInt().toDouble
          case NcFloat => b.getFloat().toDouble
          case NcDouble => b.getDouble()
          case NcChar => (b.get() & 0xFF).toDouble
        }
        i += 1
      }
    }

    if (isRecord) {
      val recs = shape.head
      var r = 0
      while (r < recs) {
        readSlab(v.begin + r * recSize, perRec, r * perRec)
        r += 1
      }
    } else readSlab(v.begin, n, 0)

    // CF packing + fill
    def att(a: String): Option[Double] =
      v.atts.find(_.name == a).flatMap(_.nums.headOption)
    val fill = att("_FillValue").orElse(att("missing_value"))
    val scale = att("scale_factor").getOrElse(1.0)
    val offset = att("add_offset").getOrElse(0.0)
    var i = 0
    while (i < n) {
      if (fill.contains(out(i))) out(i) = Double.NaN
      else if (scale != 1.0 || offset != 0.0) out(i) = out(i) * scale + offset
      i += 1
    }
    out
  }
}
