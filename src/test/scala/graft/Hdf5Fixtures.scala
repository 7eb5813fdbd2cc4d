package graft

import java.nio.{ByteBuffer, ByteOrder}

/** Hand-authored minimal HDF5 files for byte-level reader specs —
  * the same approach as the NetCDF/shapefile/FileGDB fixtures: encode
  * the publicly documented layout (HDF Group file format spec v1.0)
  * directly, so [[graft.sources.Hdf5Classic]] is tested against the
  * spec, not against itself.
  *
  * Subset encoded: v0 superblock, old-style groups (v1 group B-tree →
  * one SNOD leaf + local heap), v1 object headers, contiguous and
  * chunked layouts (v1 chunk B-tree), deflate/shuffle/fletcher32
  * filters. Element type: little-endian float32/float64/int32.
  */
object Hdf5Fixtures {

  val Undef = -1L // 0xFFFF_FFFF_FFFF_FFFF

  sealed trait AttrVal
  final case class AStr(s: String) extends AttrVal
  final case class ANum(xs: Seq[Double]) extends AttrVal

  sealed trait Node
  final case class Dset(
      dims: Seq[Int],
      clazz: Int, // 0 fixed-point, 1 float
      elemSize: Int,
      raw: Array[Byte], // row-major little-endian payload
      chunkDims: Option[Seq[Int]] = None,
      filters: Seq[Int] = Nil, // filter ids in WRITE order (e.g. shuffle=2 then deflate=1)
      attrs: Seq[(String, AttrVal)] = Nil
  ) extends Node
  final case class Group(
      children: Seq[(String, Node)],
      attrs: Seq[(String, AttrVal)] = Nil) extends Node

  def f64(dims: Seq[Int], data: Seq[Double]): Dset = {
    val b = ByteBuffer.allocate(data.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    data.foreach(b.putDouble)
    Dset(dims, 1, 8, b.array())
  }
  def f32(dims: Seq[Int], data: Seq[Float],
      chunkDims: Option[Seq[Int]] = None, filters: Seq[Int] = Nil): Dset = {
    val b = ByteBuffer.allocate(data.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    data.foreach(b.putFloat)
    Dset(dims, 1, 4, b.array(), chunkDims, filters)
  }
  def i32(dims: Seq[Int], data: Seq[Int]): Dset = {
    val b = ByteBuffer.allocate(data.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    data.foreach(b.putInt)
    Dset(dims, 0, 4, b.array())
  }
  /** An (n, strlen) NC_CHAR matrix — how netCDF-4 stores char vars
    * (H5T_C_S1 size-1 elements): each string NUL-padded to `strlen`. */
  def chars(strlen: Int, strings: Seq[String]): Dset = {
    val raw = new Array[Byte](strings.length * strlen)
    strings.zipWithIndex.foreach { case (s, i) =>
      val b = s.getBytes("UTF-8")
      System.arraycopy(b, 0, raw, i * strlen, math.min(b.length, strlen))
    }
    Dset(Seq(strings.length, strlen), 3, 1, raw)
  }

  /** The repo's committed GFED4-shaped fixture (fixtures/gfed4.hdf5):
    * 2×2 grid, 12 month groups with DM/partitioning/daily_fraction/
    * diurnal_cycle (months 3-12 all-zero), /ancill/grid_cell_area —
    * the exact tree GFED4_Inventory walks (gfed.py:145-268). Month 1's
    * DM is chunked+deflated to exercise the filtered path end-to-end. */
  def gfed4Fixture(): Array[Byte] = {
    def m2(a: Double, b: Double, c: Double, d: Double) =
      f32(Seq(2, 2), Seq(a.toFloat, b.toFloat, c.toFloat, d.toFloat))
    val zero = m2(0, 0, 0, 0)
    def month(
        dm: Dset, sava: Dset, temf: Dset,
        days: Seq[(Int, Dset)], diurnal: Map[String, Dset]): Group = {
      val slotNames = Seq("UTC_0-3h", "UTC_3-6h", "UTC_6-9h", "UTC_9-12h",
        "UTC_12-15h", "UTC_15-18h", "UTC_18-21h", "UTC_21-24h")
      Group(Seq(
        "DM" -> dm,
        "partitioning" -> Group(Seq("DM_SAVA" -> sava, "DM_TEMF" -> temf)),
        "daily_fraction" -> Group(days.map { case (d, ds) => s"day_$d" -> ds }),
        "diurnal_cycle" -> Group(
          slotNames.map(n => n -> diurnal.getOrElse(n, zero)))))
    }
    val emptyMonth = month(zero, zero, zero, Seq(1 -> zero), Map.empty)
    val months: Seq[(String, Node)] = (1 to 12).map { m =>
      f"$m%02d" -> (m match {
        case 1 => month(
          f32(Seq(2, 2), Seq(1f, 2f, 3f, 4f),
            chunkDims = Some(Seq(2, 1)), filters = Seq(1)),
          m2(0.5, 1, 0.25, 0), m2(0.5, 0, 0.75, 1),
          Seq(1 -> m2(0.25, 1, 0, 0), 2 -> m2(0.75, 0, 1, 0)),
          Map("UTC_0-3h" -> m2(0.5, 0, 0, 0), "UTC_21-24h" -> m2(0.5, 0, 0, 0)))
        case 2 => month(
          m2(5, 0, 0, 8), m2(1, 0, 0, 0.5), m2(0, 0, 0, 0.5),
          Seq(1 -> m2(1, 0, 0, 1)), Map.empty)
        case _ => emptyMonth
      })
    }
    build(Group(Seq(
      "lon" -> f64(Seq(2, 2), Seq(100.0, 102.0, 100.0, 102.0)),
      "lat" -> f64(Seq(2, 2), Seq(10.0, 10.0, 12.0, 12.0)),
      "ancill" -> Group(Seq(
        "grid_cell_area" -> f64(Seq(2, 2), Seq(10.0, 10.0, 20.0, 20.0)))),
      "emissions" -> Group(months))))
  }

  /** Encode a complete HDF5 file with `root` as the root group. */
  def build(root: Group): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 << 20).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(96) // superblock written last (fixed 96-byte v0 size)

    def align8(): Unit = while (buf.position() % 8 != 0) buf.put(0.toByte)

    // ---- message encoding ------------------------------------------------

    def pad8(n: Int): Int = (n + 7) & ~7

    /** (type, body) pairs → object header block at an 8-aligned address. */
    def writeObjectHeader(msgs: Seq[(Int, Array[Byte])]): Long = {
      align8()
      val addr = buf.position().toLong
      val blockSize = msgs.map(m => 8 + pad8(m._2.length)).sum
      buf.put(1.toByte).put(0.toByte) // version, reserved
      buf.putShort(msgs.length.toShort)
      buf.putInt(1) // reference count
      buf.putInt(blockSize)
      buf.putInt(0) // pad to 8-byte alignment of the message block
      msgs.foreach { case (t, body) =>
        buf.putShort(t.toShort)
        buf.putShort(pad8(body.length).toShort)
        buf.put(0.toByte); buf.put(0.toByte); buf.put(0.toByte); buf.put(0.toByte)
        buf.put(body)
        (body.length until pad8(body.length)).foreach(_ => buf.put(0.toByte))
      }
      addr
    }

    def dataspaceMsg(dims: Seq[Int]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + dims.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte).put(dims.length.toByte).put(0.toByte)
      b.put(0.toByte); b.putInt(0) // 5 reserved bytes
      dims.foreach(d => b.putLong(d.toLong))
      b.array()
    }

    def datatypeMsg(clazz: Int, size: Int): Array[Byte] = {
      // version 1 in the high nibble; bit field 0 = 0 (little-endian);
      // properties per class (fixed: offset+precision; float: full IEEE;
      // string: none)
      val props: Array[Byte] =
        if (clazz == 3) Array.empty[Byte]
        else if (clazz == 0) {
          val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
          b.putShort(0).putShort((size * 8).toShort); b.array()
        } else {
          val b = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
          b.putShort(0).putShort((size * 8).toShort)
          if (size == 4) { b.put(23.toByte).put(8.toByte).put(0.toByte).put(23.toByte); b.putInt(127) }
          else { b.put(52.toByte).put(11.toByte).put(0.toByte).put(52.toByte); b.putInt(1023) }
          b.array()
        }
      val b = ByteBuffer.allocate(8 + props.length).order(ByteOrder.LITTLE_ENDIAN)
      b.put(((1 << 4) | clazz).toByte)
      // fixed-point: sign bit (bit 3); float: IEEE flag bits as libhdf5;
      // string: null-padded (0) — only bit 0 (byte order) matters to the reader
      b.put((clazz match {
        case 0 => 0x08
        case 1 => 0x20
        case _ => 0x00
      }).toByte)
      b.put(0.toByte).put(0.toByte)
      b.putInt(size)
      b.put(props)
      b.array()
    }

    def layoutContiguousMsg(addr: Long, size: Long): Array[Byte] = {
      val b = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
      b.put(3.toByte).put(1.toByte).putLong(addr).putLong(size)
      b.array()
    }

    def layoutChunkedMsg(btree: Long, chunkDims: Seq[Int], elemSize: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(3 + 8 + 4 * (chunkDims.length + 1))
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(3.toByte).put(2.toByte).put((chunkDims.length + 1).toByte)
      b.putLong(btree)
      chunkDims.foreach(d => b.putInt(d))
      b.putInt(elemSize)
      b.array()
    }

    def filterMsg(ids: Seq[Int], elemSize: Int): Array[Byte] = {
      val per = ids.map { id =>
        val cd: Seq[Int] = id match {
          case 1 => Seq(6) // deflate level
          case 2 => Seq(elemSize) // shuffle element size
          case 3 => Nil // fletcher32
          case other => throw new IllegalArgumentException(s"filter $other")
        }
        val b = ByteBuffer.allocate(8 + 4 * cd.length + (if (cd.length % 2 == 1) 4 else 0))
          .order(ByteOrder.LITTLE_ENDIAN)
        b.putShort(id.toShort).putShort(0.toShort) // id, name length 0
        b.putShort(0.toShort).putShort(cd.length.toShort)
        cd.foreach(b.putInt)
        if (cd.length % 2 == 1) b.putInt(0) // pad to 8
        b.array()
      }
      val b = ByteBuffer.allocate(8 + per.map(_.length).sum).order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte).put(ids.length.toByte)
      b.putShort(0.toShort); b.putInt(0) // 6 reserved
      per.foreach(b.put)
      b.array()
    }

    def symbolTableMsg(btree: Long, heap: Long): Array[Byte] = {
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      b.putLong(btree).putLong(heap)
      b.array()
    }

    /** V1 attribute message: name/datatype/dataspace headers each padded
      * to 8, then the raw data. */
    def attributeMsg(name: String, v: AttrVal): Array[Byte] = {
      val nameBytes = name.getBytes("UTF-8") :+ 0.toByte
      val (dtMsg, dsRank, data) = v match {
        case AStr(s) =>
          val payload = s.getBytes("UTF-8") :+ 0.toByte
          val dt = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
          dt.put(((1 << 4) | 3).toByte) // class 3: string, version 1
          dt.put(0.toByte).put(0.toByte).put(0.toByte)
          dt.putInt(payload.length)
          (dt.array(), Seq.empty[Int], payload)
        case ANum(xs) =>
          val payload = ByteBuffer.allocate(xs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
          xs.foreach(payload.putDouble)
          (datatypeMsg(1, 8), if (xs.length == 1) Seq.empty[Int] else Seq(xs.length),
            payload.array())
      }
      val dsMsg = {
        val b = ByteBuffer.allocate(8 + dsRank.length * 8).order(ByteOrder.LITTLE_ENDIAN)
        b.put(1.toByte).put(dsRank.length.toByte).put(0.toByte)
        b.put(0.toByte); b.putInt(0)
        dsRank.foreach(d => b.putLong(d.toLong))
        b.array()
      }
      val total = 8 + pad8(nameBytes.length) + pad8(dtMsg.length) +
        pad8(dsMsg.length) + data.length
      val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte).put(0.toByte)
      b.putShort(nameBytes.length.toShort)
      b.putShort(dtMsg.length.toShort)
      b.putShort(dsMsg.length.toShort)
      def padded(a: Array[Byte]): Unit = {
        b.put(a); (a.length until pad8(a.length)).foreach(_ => b.put(0.toByte))
      }
      padded(nameBytes); padded(dtMsg); padded(dsMsg)
      b.put(data)
      b.array()
    }

    // ---- filters (write-side) -------------------------------------------

    def shuffleBytes(raw: Array[Byte], elemSize: Int): Array[Byte] = {
      val n = raw.length / elemSize
      val out = new Array[Byte](raw.length)
      var j = 0
      while (j < elemSize) {
        var i = 0
        while (i < n) { out(j * n + i) = raw(i * elemSize + j); i += 1 }
        j += 1
      }
      out
    }

    def deflateBytes(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(6)
      d.setInput(raw); d.finish()
      val tmp = new Array[Byte](raw.length + 64)
      var n = 0
      while (!d.finished()) n += d.deflate(tmp, n, tmp.length - n)
      d.end()
      tmp.take(n)
    }

    // ---- nodes ----------------------------------------------------------

    def writeDset(d: Dset): Long = d.chunkDims match {
      case None =>
        align8()
        val dataAddr = buf.position().toLong
        buf.put(d.raw)
        writeObjectHeader(Seq(
          0x0001 -> dataspaceMsg(d.dims),
          0x0003 -> datatypeMsg(d.clazz, d.elemSize),
          0x0008 -> layoutContiguousMsg(dataAddr, d.raw.length.toLong)) ++
          d.attrs.map { case (n, v) => 0x000C -> attributeMsg(n, v) })
      case Some(cd) =>
        val rank = d.dims.length
        // split into full-shape chunks (edge chunks zero-padded), apply
        // filters in write order, record (offsets, storedSize, addr)
        val nChunks = d.dims.zip(cd).map { case (n, c) => (n + c - 1) / c }
        val chunkCount = nChunks.product
        val chunkElems = cd.product
        val entries = (0 until chunkCount).map { ci =>
          // chunk grid coordinates
          var rem = ci
          val coord = new Array[Int](rank)
          var k = rank - 1
          while (k >= 0) { coord(k) = rem % nChunks(k); rem /= nChunks(k); k -= 1 }
          val offsets = coord.indices.map(k2 => coord(k2).toLong * cd(k2))
          val chunkRaw = new Array[Byte](chunkElems * d.elemSize)
          // gather rows from the source array
          val idx = new Array[Int](rank)
          var flat = 0
          while (flat < chunkElems) {
            var srcPos = 0L
            var ok = true
            var k3 = 0
            while (k3 < rank) {
              val abs = offsets(k3) + idx(k3)
              if (abs >= d.dims(k3)) { ok = false; k3 = rank }
              else { srcPos = srcPos * d.dims(k3) + abs; k3 += 1 }
            }
            if (ok) System.arraycopy(
              d.raw, srcPos.toInt * d.elemSize, chunkRaw, flat * d.elemSize, d.elemSize)
            var k4 = rank - 1
            while (k4 >= 0) {
              idx(k4) += 1
              if (idx(k4) < cd(k4)) k4 = -1 else { idx(k4) = 0; k4 -= 1 }
            }
            flat += 1
          }
          var stored = chunkRaw
          d.filters.foreach { id =>
            stored = id match {
              case 1 => deflateBytes(stored)
              case 2 => shuffleBytes(stored, d.elemSize)
              case 3 => stored ++ Array[Byte](0, 0, 0, 0) // dummy checksum
            }
          }
          align8()
          val addr = buf.position().toLong
          buf.put(stored)
          (offsets, stored.length, addr)
        }
        // single level-0 chunk B-tree node holding every chunk
        align8()
        val btreeAddr = buf.position().toLong
        buf.put('T'.toByte).put('R'.toByte).put('E'.toByte).put('E'.toByte)
        buf.put(1.toByte).put(0.toByte) // node type 1, level 0
        buf.putShort(entries.length.toShort)
        buf.putLong(Undef).putLong(Undef)
        def putKey(offsets: Seq[Long], size: Int): Unit = {
          buf.putInt(size); buf.putInt(0) // stored size, filter mask
          offsets.foreach(buf.putLong); buf.putLong(0L) // elem-size dim offset
        }
        entries.foreach { case (off, size, addr) =>
          putKey(off, size); buf.putLong(addr)
        }
        // trailing key: one past the last chunk
        putKey(d.dims.zip(cd).map { case (n, c) => (((n + c - 1) / c).toLong) * c }, 0)
        val msgs = Seq(
          0x0001 -> dataspaceMsg(d.dims),
          0x0003 -> datatypeMsg(d.clazz, d.elemSize)) ++
          (if (d.filters.nonEmpty) Seq(0x000B -> filterMsg(d.filters, d.elemSize)) else Nil) ++
          Seq(0x0008 -> layoutChunkedMsg(btreeAddr, cd, d.elemSize)) ++
          d.attrs.map { case (n, v) => 0x000C -> attributeMsg(n, v) }
        writeObjectHeader(msgs)
    }

    def writeGroup(g: Group): Long = {
      val kids = g.children.sortBy(_._1).map { case (name, node) =>
        name -> writeNode(node)
      }
      // local heap: offset 0 = empty string, names 8-aligned after it
      val nameBytes = new java.io.ByteArrayOutputStream()
      nameBytes.write(0)
      (1 until 8).foreach(_ => nameBytes.write(0))
      val nameOffs = kids.map { case (name, _) =>
        val off = nameBytes.size().toLong
        name.getBytes("UTF-8").foreach(c => nameBytes.write(c.toInt))
        nameBytes.write(0)
        while (nameBytes.size() % 8 != 0) nameBytes.write(0)
        off
      }
      align8()
      val heapDataAddr = buf.position().toLong + 32 // heap header is 32 bytes
      val heapAddr = buf.position().toLong
      buf.put('H'.toByte).put('E'.toByte).put('A'.toByte).put('P'.toByte)
      buf.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      buf.putLong(nameBytes.size().toLong) // data segment size
      buf.putLong(1L) // free list head offset (1 = none, libhdf5 convention)
      buf.putLong(heapDataAddr)
      buf.put(nameBytes.toByteArray)
      // SNOD with every child entry (name-sorted, as the format requires)
      align8()
      val snodAddr = buf.position().toLong
      buf.put('S'.toByte).put('N'.toByte).put('O'.toByte).put('D'.toByte)
      buf.put(1.toByte).put(0.toByte)
      buf.putShort(kids.length.toShort)
      kids.zip(nameOffs).foreach { case ((_, header), nameOff) =>
        buf.putLong(nameOff)
        buf.putLong(header)
        buf.putInt(0); buf.putInt(0) // cache type 0, reserved
        buf.putLong(0L); buf.putLong(0L) // scratch
      }
      // group B-tree: one leaf entry pointing at the SNOD
      align8()
      val btreeAddr = buf.position().toLong
      buf.put('T'.toByte).put('R'.toByte).put('E'.toByte).put('E'.toByte)
      buf.put(0.toByte).put(0.toByte) // node type 0, level 0
      buf.putShort(1.toShort)
      buf.putLong(Undef).putLong(Undef)
      buf.putLong(0L) // key 0: offset of the empty string
      buf.putLong(snodAddr)
      buf.putLong(nameOffs.lastOption.getOrElse(0L)) // key 1: last name
      writeObjectHeader(Seq(0x0011 -> symbolTableMsg(btreeAddr, heapAddr)) ++
        g.attrs.map { case (n, v) => 0x000C -> attributeMsg(n, v) })
    }

    def writeNode(n: Node): Long = n match {
      case d: Dset => writeDset(d)
      case g: Group => writeGroup(g)
    }

    val rootHeader = writeGroup(root)
    val eof = buf.position().toLong
    // root group's btree/heap for the superblock scratch cache: re-read
    // them from the object header we just wrote (symbol table message
    // body = btree(8) + heap(8) at headerAddr + 16 + 8)
    val hb = ByteBuffer.wrap(buf.array()).order(ByteOrder.LITTLE_ENDIAN)
    hb.position(rootHeader.toInt + 16 + 8)
    val rootBtree = hb.getLong(); val rootHeap = hb.getLong()

    // superblock (v0, 96 bytes at offset 0)
    buf.position(0)
    buf.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n'))
    buf.put(0.toByte) // superblock version
    buf.put(0.toByte).put(0.toByte).put(0.toByte) // fs version, symtab version, reserved
    buf.put(0.toByte) // shared header message version
    buf.put(8.toByte).put(8.toByte) // size of offsets / lengths
    buf.put(0.toByte)
    buf.putShort(4.toShort).putShort(16.toShort) // group leaf / internal k
    buf.putInt(0) // consistency flags
    buf.putLong(0L) // base address
    buf.putLong(Undef) // free space address
    buf.putLong(eof) // end of file address
    buf.putLong(Undef) // driver info address
    buf.putLong(0L) // root link name offset
    buf.putLong(rootHeader)
    buf.putInt(1) // cache type 1: scratch caches btree + heap
    buf.putInt(0)
    buf.putLong(rootBtree)
    buf.putLong(rootHeap)

    val out = new Array[Byte](eof.toInt)
    System.arraycopy(buf.array(), 0, out, 0, eof.toInt)
    out
  }
}

/** One-shot generator for the committed gate fixture
  * (`fixtures/gfed4.hdf5`): `sbt "Test/runMain graft.GenGfed4Fixture"`.
  * The file is deterministic (fixed deflate level, fixed layout), and
  * GfedSpec re-validates the committed bytes every run. */
object GenGfed4Fixture {
  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get(
      if (args.nonEmpty) args(0) else "fixtures/gfed4.hdf5")
    java.nio.file.Files.write(out, Hdf5Fixtures.gfed4Fixture())
    println(s"wrote $out (${java.nio.file.Files.size(out)} bytes)")
  }
}
