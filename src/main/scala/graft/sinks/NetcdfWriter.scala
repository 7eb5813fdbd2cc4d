package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}
import graft.sources.NetcdfClassic
import graft.sources.NetcdfClassic.{NcAtt, NcDim}

/** Pure-JVM WRITER for the NetCDF CLASSIC binary format — the byte-level
  * inverse of [[graft.sources.NetcdfClassic]]: header (dim list, global
  * attribute list, variable list with computed vsize/begin offsets)
  * followed by big-endian data, non-record variables contiguous, record
  * variables interleaved per record.
  *
  * This is what makes the export sinks emit actual model-ready `.nc`
  * files — the reference's every export ends in `Dataset.to_netcdf`
  * (emiproc/exports/rasters.py:14-323, icon.py:540-546, hourly.py:186+).
  * The layout follows the publicly documented Unidata classic file
  * format spec only; CDF-1 (32-bit offsets) and CDF-2 (64-bit offsets)
  * both supported.
  *
  * Driver/task-side by design: a single exported raster or profile file
  * is grid-sized (≪ fact tables); the encoder is pure `Array[Byte]` in /
  * out, so per-hour file fan-out can run inside `foreachPartition` with
  * one task per file at scale.
  */
object NetcdfWriter {

  import NetcdfClassic.{NcByte, NcChar, NcShort, NcInt, NcFloat, NcDouble}

  /** A variable to write. `dims` are names resolved against the dim list.
    * Numeric data row-major in `doubles` (record dim outermost, unrolled
    * over numrecs); NC_CHAR data as one string per outer-dim entry,
    * padded/truncated to the final dim's length. */
  final case class WriteVar(
      name: String,
      dims: Seq[String],
      ncType: Int,
      atts: Seq[NcAtt] = Nil,
      doubles: Array[Double] = Array.emptyDoubleArray,
      strings: Seq[String] = Nil)

  /** Text attribute (NC_CHAR). */
  def textAtt(name: String, value: String): NcAtt =
    NcAtt(name, NcChar, value, Nil)

  /** Numeric attribute. */
  def numAtt(name: String, values: Seq[Double], ncType: Int = NcDouble): NcAtt =
    NcAtt(name, ncType, "", values)

  private def typeSize(t: Int): Int = t match {
    case NcByte | NcChar => 1
    case NcShort => 2
    case NcInt | NcFloat => 4
    case NcDouble => 8
    case other => throw new IllegalArgumentException(s"nc_type $other")
  }

  private def pad4(n: Long): Long = (n + 3) & ~3L

  /** Encode a complete classic-format file. Dim order in `dims` defines
    * dim ids; at most one record dim (length 0), which must be each
    * record variable's FIRST dim; `numrecs` gives its unrolled length. */
  def write(
      dims: Seq[NcDim],
      gatts: Seq[NcAtt],
      vars: Seq[WriteVar],
      numrecs: Int = 0,
      version: Int = 2): Array[Byte] = {
    require(version == 1 || version == 2, s"classic CDF-1/2 only (got $version)")
    require(dims.count(_.isRecord) <= 1, "at most one record dimension")
    val dimId = dims.map(_.name).zipWithIndex.toMap

    def nameBytes(s: String): Int = 4 + pad4(s.getBytes("UTF-8").length.toLong).toInt
    def attBytes(a: NcAtt): Int = {
      val n = if (a.ncType == NcChar) a.text.getBytes("UTF-8").length else a.nums.length
      nameBytes(a.name) + 8 + pad4(n.toLong * typeSize(a.ncType)).toInt
    }
    def attListBytes(as: Seq[NcAtt]): Int = 8 + as.map(attBytes).sum

    val beginWidth = if (version == 1) 4 else 8
    def varHeaderBytes(v: WriteVar): Int =
      nameBytes(v.name) + 4 + 4 * v.dims.length + attListBytes(v.atts) +
        4 + 4 + beginWidth

    val headerSize =
      4 + 4 + // magic + numrecs
        (8 + dims.map(d => nameBytes(d.name) + 4).sum) + // dim list
        attListBytes(gatts) +
        (8 + vars.map(varHeaderBytes).sum) // var list

    // vsize & layout (classic spec): product of non-record dim lengths ×
    // type size, padded to 4 — except a SINGLE record variable of type
    // char/byte/short, whose record slabs are packed unpadded.
    def isRec(v: WriteVar): Boolean =
      v.dims.headOption.exists(n => dims(dimId(n)).isRecord)
    val recVars = vars.filter(isRec)
    val singleSmallRec = recVars.size == 1 &&
      Seq(NcChar, NcByte, NcShort).contains(recVars.head.ncType)
    def slabElems(v: WriteVar): Long =
      v.dims.map(n => dims(dimId(n))).filterNot(_.isRecord)
        .map(_.length.toLong).product
    def vsize(v: WriteVar): Long = {
      val raw = slabElems(v) * typeSize(v.ncType)
      if (isRec(v) && singleSmallRec) raw else pad4(raw)
    }

    var offset = headerSize.toLong
    val begins = scala.collection.mutable.Map.empty[String, Long]
    vars.filterNot(isRec).foreach { v =>
      begins(v.name) = offset; offset += vsize(v)
    }
    val recBase = offset
    recVars.foreach { v => begins(v.name) = offset; offset += vsize(v) }
    val recSize = recVars.map(vsize).sum
    val totalSize = recBase + recSize * numrecs

    require(totalSize <= Int.MaxValue, s"file too large for in-memory encode: $totalSize")
    val out = ByteBuffer.allocate(totalSize.toInt).order(ByteOrder.BIG_ENDIAN)

    def putName(s: String): Unit = {
      val b = s.getBytes("UTF-8")
      out.putInt(b.length); out.put(b)
      (b.length until pad4(b.length.toLong).toInt).foreach(_ => out.put(0.toByte))
    }
    def putAtts(as: Seq[NcAtt]): Unit = {
      out.putInt(if (as.isEmpty) 0 else 0x0C); out.putInt(as.length)
      as.foreach { a =>
        putName(a.name); out.putInt(a.ncType)
        if (a.ncType == NcChar) {
          val b = a.text.getBytes("UTF-8")
          out.putInt(b.length); out.put(b)
          (b.length until pad4(b.length.toLong).toInt).foreach(_ => out.put(0.toByte))
        } else {
          out.putInt(a.nums.length)
          val start = out.position()
          a.nums.foreach(d => putScalar(a.ncType, d))
          val written = out.position() - start
          (written until pad4(written.toLong).toInt).foreach(_ => out.put(0.toByte))
        }
      }
    }
    def putScalar(t: Int, d: Double): Unit = t match {
      case NcByte | NcChar => out.put(d.toByte)
      case NcShort => out.putShort(d.toShort)
      case NcInt => out.putInt(d.toInt)
      case NcFloat => out.putFloat(d.toFloat)
      case NcDouble => out.putDouble(d)
    }

    // ---- header
    out.put('C'.toByte).put('D'.toByte).put('F'.toByte).put(version.toByte)
    out.putInt(numrecs)
    out.putInt(if (dims.isEmpty) 0 else 0x0A); out.putInt(dims.length)
    dims.foreach { d => putName(d.name); out.putInt(d.length) }
    putAtts(gatts)
    out.putInt(if (vars.isEmpty) 0 else 0x0B); out.putInt(vars.length)
    vars.foreach { v =>
      putName(v.name)
      out.putInt(v.dims.length)
      v.dims.foreach(n => out.putInt(dimId(n)))
      putAtts(v.atts)
      out.putInt(v.ncType)
      out.putInt(math.min(vsize(v), Int.MaxValue.toLong).toInt)
      if (version == 1) out.putInt(begins(v.name).toInt)
      else out.putLong(begins(v.name))
    }
    require(out.position() == headerSize, s"header size mismatch: ${out.position()} vs $headerSize")

    // ---- data
    def charSlab(v: WriteVar): Array[Byte] = {
      val strlen = v.dims.map(n => dims(dimId(n))).filterNot(_.isRecord) match {
        case ds if ds.nonEmpty => ds.last.length
        case _ => 1
      }
      val count = (slabElems(v) / strlen).toInt * (if (isRec(v)) numrecs else 1)
      val buf = new Array[Byte](count * strlen)
      v.strings.take(count).zipWithIndex.foreach { case (s, i) =>
        val b = s.getBytes("UTF-8").take(strlen)
        System.arraycopy(b, 0, buf, i * strlen, b.length)
      }
      buf
    }

    def writeSlab(v: WriteVar, rec: Int): Unit = {
      val n = slabElems(v).toInt
      val start = out.position()
      if (v.ncType == NcChar) {
        val all = charSlab(v)
        out.put(all, rec * n, n)
      } else {
        val base = rec * n
        var i = 0
        while (i < n) { putScalar(v.ncType, v.doubles(base + i)); i += 1 }
      }
      val written = (out.position() - start).toLong
      (written until vsize(v)).foreach(_ => out.put(0.toByte))
    }

    vars.filterNot(isRec).foreach { v =>
      require(out.position() == begins(v.name).toInt,
        s"layout mismatch at ${v.name}")
      writeSlab(v, 0)
    }
    var r = 0
    while (r < numrecs) {
      recVars.foreach(v => writeSlab(v, r))
      r += 1
    }
    out.array()
  }
}
