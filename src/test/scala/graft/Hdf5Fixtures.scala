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
      attrs: Seq[(String, AttrVal)] = Nil,
      // new-format chunk index (buildNew only): "auto" = single chunk
      // when one chunk, fixed array otherwise; "implicit" forces the
      // implicit index (unfiltered only)
      v4Index: String = "auto"
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
  def gfed4Fixture(): Array[Byte] = build(gfed4Tree())

  /** The GFED4 fixture tree, shared with the new-format encoding
    * ([[Hdf5NewFixtures.gfed4NfFixture]]). */
  def gfed4Tree(): Group = {
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
    Group(Seq(
      "lon" -> f64(Seq(2, 2), Seq(100.0, 102.0, 100.0, 102.0)),
      "lat" -> f64(Seq(2, 2), Seq(10.0, 10.0, 12.0, 12.0)),
      "ancill" -> Group(Seq(
        "grid_cell_area" -> f64(Seq(2, 2), Seq(10.0, 10.0, 20.0, 20.0)))),
      "emissions" -> Group(months)))
  }

  // ---- helpers shared by the classic and new-format builders -----------

  private[graft] def pad8(n: Int): Int = (n + 7) & ~7

  private[graft] def datatypeMsgShared(clazz: Int, size: Int): Array[Byte] = {
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

  private[graft] def filterMsgShared(ids: Seq[Int], elemSize: Int): Array[Byte] = {
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

  private[graft] def shuffleBytesShared(raw: Array[Byte], elemSize: Int): Array[Byte] = {
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

  private[graft] def deflateBytesShared(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(6)
    d.setInput(raw); d.finish()
    val tmp = new Array[Byte](raw.length + 64)
    var n = 0
    while (!d.finished()) n += d.deflate(tmp, n, tmp.length - n)
    d.end()
    tmp.take(n)
  }

  /** Gather one full-shape chunk (edge chunks zero-padded) from the
    * row-major source payload of `d`, at grid origin `offsets`. */
  private[graft] def chunkPayload(d: Dset, cd: Seq[Int], offsets: Seq[Long]): Array[Byte] = {
    val rank = d.dims.length
    val chunkElems = cd.product
    val chunkRaw = new Array[Byte](chunkElems * d.elemSize)
    val idx = new Array[Int](rank)
    var flat = 0
    while (flat < chunkElems) {
      var srcPos = 0L
      var ok = true
      var k = 0
      while (k < rank) {
        val abs = offsets(k) + idx(k)
        if (abs >= d.dims(k)) { ok = false; k = rank }
        else { srcPos = srcPos * d.dims(k) + abs; k += 1 }
      }
      if (ok) System.arraycopy(
        d.raw, srcPos.toInt * d.elemSize, chunkRaw, flat * d.elemSize, d.elemSize)
      var k2 = rank - 1
      while (k2 >= 0) {
        idx(k2) += 1
        if (idx(k2) < cd(k2)) k2 = -1 else { idx(k2) = 0; k2 -= 1 }
      }
      flat += 1
    }
    chunkRaw
  }

  /** Apply `filters` in write order to a chunk payload. */
  private[graft] def applyFilters(raw: Array[Byte], filters: Seq[Int], elemSize: Int): Array[Byte] = {
    var stored = raw
    filters.foreach { id =>
      stored = id match {
        case 1 => deflateBytesShared(stored)
        case 2 => shuffleBytesShared(stored, elemSize)
        case 3 => stored ++ Array[Byte](0, 0, 0, 0) // dummy checksum
      }
    }
    stored
  }

  /** Encode a complete HDF5 file with `root` as the root group. */
  def build(root: Group): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 << 20).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(96) // superblock written last (fixed 96-byte v0 size)

    def align8(): Unit = while (buf.position() % 8 != 0) buf.put(0.toByte)

    // ---- message encoding ------------------------------------------------

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

    def datatypeMsg(clazz: Int, size: Int): Array[Byte] =
      datatypeMsgShared(clazz, size)

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

    def filterMsg(ids: Seq[Int], elemSize: Int): Array[Byte] =
      filterMsgShared(ids, elemSize)

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
          val stored = applyFilters(chunkRaw, d.filters, d.elemSize)
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

/** Encode the NEW-format variant of a fixture tree: v3 superblock, v2
  * ("OHDR") object headers with real Jenkins-lookup3 checksums, compact
  * Link messages (+ Link Info with undefined fractal heap + Group
  * Info — the shape `libver='latest'` writers produce), v3 attribute
  * messages, v2 dataspaces, and v4 data layouts with the single-chunk,
  * implicit and fixed-array chunk indexes. Checksums are REAL (the
  * reader verifies every one), so a framing disagreement between
  * writer and reader fails loudly rather than parsing garbage.
  */
object Hdf5NewFixtures {
  import Hdf5Fixtures._

  def checksum(bytes: Array[Byte], from: Int, until: Int): Int =
    graft.sources.Hdf5Classic.lookup3(bytes, from, until)

  /** The committed new-format gate fixture (fixtures/gfed4_nf.hdf5):
    * the EXACT tree of fixtures/gfed4.hdf5 through the new container —
    * same data, so the gate query's pinned oracle carries over. Month
    * 1's chunked+deflated DM lands on the single-chunk filtered index;
    * `faPageBits=1` forces a multi-chunk dataset onto the PAGED
    * fixed-array path so the committed fixture exercises it. */
  def gfed4NfFixture(): Array[Byte] = {
    val tree = gfed4Tree()
    // widen one all-zero month's DM to a multi-chunk fixed-array layout
    val months = tree.children.collectFirst { case ("emissions", g: Group) => g }.get
    val patched = Group(tree.children.map {
      case ("emissions", _: Group) =>
        "emissions" -> Group(months.children.map {
          case ("03", m: Group) =>
            "03" -> Group(m.children.map {
              case ("DM", d: Dset) =>
                "DM" -> d.copy(chunkDims = Some(Seq(1, 1)), filters = Seq(1))
              case kv => kv
            })
          case kv => kv
        })
      case kv => kv
    })
    buildNew(patched, forceContinuation = true, faPageBits = 1)
  }

  /** `forceContinuation` splits the ROOT group's header into chunk 0 +
    * one OCHK continuation block (exercises the OCHK path);
    * `faPageBits` sizes fixed-array pages (default 10 like libhdf5; a
    * small value forces the paged data-block layout). */
  def buildNew(
      root: Group,
      forceContinuation: Boolean = false,
      faPageBits: Int = 10): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 << 20).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(48) // v3 superblock written last (fixed 48-byte size)

    def putChecksum(start: Long): Unit =
      buf.putInt(checksum(buf.array(), start.toInt, buf.position()))

    // ---- message encoders (v2 framing: unpadded) ------------------------

    def dataspaceV2(dims: Seq[Int]): Array[Byte] = {
      val b = ByteBuffer.allocate(4 + dims.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      b.put(2.toByte).put(dims.length.toByte).put(0.toByte)
      b.put((if (dims.isEmpty) 0 else 1).toByte) // type: scalar / simple
      dims.foreach(d => b.putLong(d.toLong))
      b.array()
    }

    def datatypeMsg(clazz: Int, size: Int): Array[Byte] =
      Hdf5Fixtures.datatypeMsgShared(clazz, size)

    /** V3 attribute message: flags 0, unpadded name/datatype/dataspace,
      * name-charset byte. */
    def attributeV3(name: String, v: AttrVal): Array[Byte] = {
      val nameBytes = name.getBytes("UTF-8") :+ 0.toByte
      val (dtMsg, dsRank, data) = v match {
        case AStr(s) =>
          val payload = s.getBytes("UTF-8") :+ 0.toByte
          val dt = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
          dt.put(((1 << 4) | 3).toByte)
          dt.put(0.toByte).put(0.toByte).put(0.toByte)
          dt.putInt(payload.length)
          (dt.array(), Seq.empty[Int], payload)
        case ANum(xs) =>
          val payload = ByteBuffer.allocate(xs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
          xs.foreach(payload.putDouble)
          (datatypeMsg(1, 8), if (xs.length == 1) Seq.empty[Int] else Seq(xs.length),
            payload.array())
      }
      val dsMsg = dataspaceV2(dsRank)
      val b = ByteBuffer.allocate(9 + nameBytes.length + dtMsg.length + dsMsg.length + data.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(3.toByte).put(0.toByte) // version 3, flags (nothing shared)
      b.putShort(nameBytes.length.toShort)
      b.putShort(dtMsg.length.toShort)
      b.putShort(dsMsg.length.toShort)
      b.put(0.toByte) // name charset: ASCII
      b.put(nameBytes).put(dtMsg).put(dsMsg).put(data)
      b.array()
    }

    /** Hard link, version 1, flags 0 (1-byte name length, no creation
      * order / type / charset fields). */
    def linkMsg(name: String, header: Long): Array[Byte] = {
      val nm = name.getBytes("UTF-8")
      require(nm.length < 256, s"link name too long: $name")
      val b = ByteBuffer.allocate(3 + nm.length + 8).order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte).put(0.toByte).put(nm.length.toByte)
      b.put(nm).putLong(header)
      b.array()
    }

    /** Link Info with UNDEFINED fractal heap = compact link storage. */
    def linkInfoMsg(): Array[Byte] = {
      val b = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
      b.put(0.toByte).put(0.toByte).putLong(Undef).putLong(Undef)
      b.array()
    }

    def groupInfoMsg(): Array[Byte] = Array[Byte](0, 0) // version 0, flags 0

    // ---- v2 object headers ----------------------------------------------

    /** Write an OHDR v2 header (flags: 4-byte chunk-0 size, nothing
      * optional). With `cont`, chunk 0 keeps only the first message and
      * a continuation message; the rest land in an OCHK block. */
    def writeOH(msgs: Seq[(Int, Array[Byte])], cont: Boolean = false): Long = {
      val addr = buf.position().toLong
      def putMsg(t: Int, body: Array[Byte]): Unit = {
        buf.put(t.toByte); buf.putShort(body.length.toShort); buf.put(0.toByte)
        buf.put(body)
      }
      if (!cont || msgs.length < 2) {
        val msgBytes = msgs.map(4 + _._2.length).sum
        buf.put('O'.toByte).put('H'.toByte).put('D'.toByte).put('R'.toByte)
        buf.put(2.toByte).put(2.toByte) // version, flags (chunk-0 size = 4 bytes)
        buf.putInt(msgBytes)
        msgs.foreach { case (t, body) => putMsg(t, body) }
        putChecksum(addr)
      } else {
        val rest = msgs.tail
        val chunk0Size = (4 + msgs.head._2.length) + (4 + 16)
        val ochkAddr = addr + 10 + chunk0Size + 4
        val ochkLen = 4 + rest.map(4 + _._2.length).sum + 4 // sig + msgs + checksum
        buf.put('O'.toByte).put('H'.toByte).put('D'.toByte).put('R'.toByte)
        buf.put(2.toByte).put(2.toByte)
        buf.putInt(chunk0Size)
        putMsg(msgs.head._1, msgs.head._2)
        val contBody = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
        contBody.putLong(ochkAddr).putLong(ochkLen.toLong)
        putMsg(0x0010, contBody.array())
        putChecksum(addr)
        require(buf.position() == ochkAddr, "OCHK address arithmetic broken")
        buf.put('O'.toByte).put('C'.toByte).put('H'.toByte).put('K'.toByte)
        rest.foreach { case (t, body) => putMsg(t, body) }
        putChecksum(ochkAddr)
      }
      addr
    }

    // ---- datasets -------------------------------------------------------

    def writeDset(d: Dset): Long = {
      val layoutMsg: Array[Byte] = d.chunkDims match {
        case None =>
          val dataAddr = buf.position().toLong
          buf.put(d.raw)
          val b = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
          b.put(4.toByte).put(1.toByte).putLong(dataAddr).putLong(d.raw.length.toLong)
          b.array()
        case Some(cd) =>
          val rank = d.dims.length
          val nChunks = d.dims.zip(cd).map { case (n, c) => (n + c - 1) / c }
          val chunkCount = nChunks.product
          def origin(ci: Int): Seq[Long] = {
            var rem = ci
            val coord = new Array[Long](rank)
            var k = rank - 1
            while (k >= 0) { coord(k) = (rem % nChunks(k)).toLong * cd(k); rem /= nChunks(k); k -= 1 }
            coord.toSeq
          }
          // write chunk payloads back-to-back in grid order (the
          // implicit index REQUIRES contiguous full-size chunks)
          val entries = (0 until chunkCount).map { ci =>
            val stored = applyFilters(chunkPayload(d, cd, origin(ci)), d.filters, d.elemSize)
            val at = buf.position().toLong
            buf.put(stored)
            (at, stored.length)
          }
          def chunkedHeader(b: ByteBuffer, flags: Int, idxType: Int): Unit = {
            b.put(4.toByte).put(2.toByte).put(flags.toByte)
            b.put((rank + 1).toByte).put(8.toByte) // dims incl. elem size, 8-byte encoded
            cd.foreach(c => b.putLong(c.toLong))
            b.putLong(d.elemSize.toLong)
            b.put(idxType.toByte)
          }
          if (chunkCount == 1 && d.v4Index != "implicit") {
            // single-chunk index; filtered variant carries size + mask
            val filtered = d.filters.nonEmpty
            val b = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
            chunkedHeader(b, if (filtered) 2 else 0, 1)
            if (filtered) { b.putLong(entries.head._2.toLong); b.putInt(0) }
            b.putLong(entries.head._1)
            b.array().take(b.position())
          } else if (d.v4Index == "implicit") {
            require(d.filters.isEmpty, "implicit index is unfiltered only")
            val b = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
            chunkedHeader(b, 0, 2)
            b.putLong(entries.head._1)
            b.array().take(b.position())
          } else {
            // fixed-array index: FAHD + FADB (+ pages when the entry
            // count exceeds 2^faPageBits)
            val clientId = if (d.filters.isEmpty) 0 else 1
            val entrySize = if (clientId == 0) 8 else 20 // addr + size(8) + mask(4)
            def putEntry(e: (Long, Int)): Unit =
              if (clientId == 0) buf.putLong(e._1)
              else { buf.putLong(e._1); buf.putLong(e._2.toLong); buf.putInt(0) }
            val faAddr = buf.position().toLong
            val dblkAddr = faAddr + 28
            buf.put('F'.toByte).put('A'.toByte).put('H'.toByte).put('D'.toByte)
            buf.put(0.toByte).put(clientId.toByte)
            buf.put(entrySize.toByte).put(faPageBits.toByte)
            buf.putLong(chunkCount.toLong)
            buf.putLong(dblkAddr)
            putChecksum(faAddr)
            require(buf.position() == dblkAddr, "FADB address arithmetic broken")
            buf.put('F'.toByte).put('A'.toByte).put('D'.toByte).put('B'.toByte)
            buf.put(0.toByte).put(clientId.toByte)
            buf.putLong(faAddr)
            val pageElems = 1 << faPageBits
            if (chunkCount <= pageElems) {
              entries.foreach(putEntry)
              putChecksum(dblkAddr)
            } else {
              val npages = (chunkCount + pageElems - 1) / pageElems
              (0 until (npages + 7) / 8).foreach(_ => buf.put(0xFF.toByte)) // all initialized
              putChecksum(dblkAddr)
              entries.grouped(pageElems).foreach { page =>
                val pageStart = buf.position().toLong
                page.foreach(putEntry)
                putChecksum(pageStart)
              }
            }
            val b = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
            chunkedHeader(b, 0, 3)
            b.put(faPageBits.toByte)
            b.putLong(faAddr)
            b.array().take(b.position())
          }
      }
      val msgs = Seq(
        0x0001 -> dataspaceV2(d.dims),
        0x0003 -> datatypeMsg(d.clazz, d.elemSize)) ++
        (if (d.filters.nonEmpty) Seq(0x000B -> Hdf5Fixtures.filterMsgShared(d.filters, d.elemSize)) else Nil) ++
        Seq(0x0008 -> layoutMsg) ++
        d.attrs.map { case (n, v) => 0x000C -> attributeV3(n, v) }
      writeOH(msgs)
    }

    def writeGroup(g: Group, cont: Boolean): Long = {
      val kids = g.children.sortBy(_._1).map { case (name, node) =>
        name -> writeNode(node)
      }
      val msgs =
        Seq(0x0002 -> linkInfoMsg(), 0x000A -> groupInfoMsg()) ++
          kids.map { case (name, header) => 0x0006 -> linkMsg(name, header) } ++
          g.attrs.map { case (n, v) => 0x000C -> attributeV3(n, v) }
      writeOH(msgs, cont)
    }

    def writeNode(n: Node): Long = n match {
      case d: Dset => writeDset(d)
      case g: Group => writeGroup(g, cont = false)
    }

    val rootHeader = writeGroup(root, cont = forceContinuation)
    val eof = buf.position().toLong

    // v3 superblock (48 bytes at 0)
    buf.position(0)
    buf.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n'))
    buf.put(3.toByte) // superblock version
    buf.put(8.toByte).put(8.toByte) // size of offsets / lengths
    buf.put(0.toByte) // file consistency flags
    buf.putLong(0L) // base address
    buf.putLong(Undef) // superblock extension
    buf.putLong(eof)
    buf.putLong(rootHeader)
    putChecksum(0)

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

/** One-shot generator for the committed NEW-format gate fixture
  * (`fixtures/gfed4_nf.hdf5`): `sbt "Test/runMain graft.GenGfed4NfFixture"`.
  * Same data as gfed4.hdf5 through the v3-superblock container;
  * Hdf5NewFormatSpec re-validates the committed bytes every run. */
object GenGfed4NfFixture {
  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get(
      if (args.nonEmpty) args(0) else "fixtures/gfed4_nf.hdf5")
    java.nio.file.Files.write(out, Hdf5NewFixtures.gfed4NfFixture())
    println(s"wrote $out (${java.nio.file.Files.size(out)} bytes)")
  }
}
