package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM reader for the HDF5 binary format — the "classic" subset
  * that libhdf5 writes by default (libver "earliest", the layout of
  * every GFED4 distribution and of netCDF-4 files produced without
  * new-format flags): version-0/1 superblock, old-style groups (v1
  * B-tree over SNOD symbol-table nodes + local heap names), v1 object
  * headers with continuation blocks, contiguous and chunked dataset
  * layouts (v1 B-tree chunk index), and the three ubiquitous filters —
  * deflate (via `java.util.zip.Inflater`), shuffle, fletcher32.
  *
  * Everything implements the publicly documented HDF5 File Format
  * Specification (HDF Group, format spec v1.0: superblock §II, symbol
  * table/B-tree/heap §III, object headers §IV, datatype/dataspace/
  * layout/filter messages §IV.A). No library code involved.
  *
  * This closes the S3 container gap recorded since round 2: the
  * reference reads GFED4 through xarray/h5py
  * (emiproc/inventories/gfed.py:104-240, `phony_dims="sort"` = plain
  * HDF5 groups without netCDF metadata); those files are exactly this
  * subset. New-format files (v2/v3 superblock, fractal-heap groups)
  * raise with a clear message — `h5repack -L` converts them.
  *
  * Driver-side by design, like [[NetcdfClassic]]: headers are tiny and
  * one file's arrays are grid-sized. The 100 TB path is many files ×
  * partitions via `binaryFile` + `mapPartitions` — the parser is pure
  * and serializable.
  */
object Hdf5Classic {

  private val Undef = -1L // 0xFFFF... addresses parse to -1 in a signed long

  final case class Dataset(
      dims: Seq[Int],
      data: Array[Double])

  /** Attribute decoded from a v1 attribute message: `text` for string
    * payloads, `nums` for numeric ones. */
  final case class H5Attr(name: String, text: String, nums: Seq[Double])

  def open(bytes: Array[Byte]): H5 = new H5(bytes)

  final class H5(bytes: Array[Byte]) {
    private val sb = readSuperblock()

    private def buf(pos: Long): ByteBuffer = {
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      b.position(pos.toInt)
      b
    }

    // ---- superblock -----------------------------------------------------

    private case class Superblock(
        version: Int, base: Long, rootHeaderAddr: Long,
        rootBtree: Long, rootHeap: Long)

    private def readSuperblock(): Superblock = {
      val sig = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')
      // the superblock may start at 0, 512, 1024, ... — byte 0 in practice
      var off = 0L
      def matches(o: Long): Boolean =
        o + 8 <= bytes.length && (0 until 8).forall(i => bytes(o.toInt + i) == sig(i))
      if (!matches(0)) {
        var o = 512L
        while (o < bytes.length && !matches(o)) o *= 2
        require(o < bytes.length, "not an HDF5 file (signature not found)")
        off = o
      }
      val b = buf(off + 8)
      val version = b.get().toInt
      require(version == 0 || version == 1,
        s"HDF5 superblock version $version unsupported (classic v0/v1 only; " +
          "h5repack -L rewrites new-format files)")
      b.get(); b.get(); b.get() // free-space, symtab versions, reserved
      b.get() // shared header message version
      val sizeOffsets = b.get().toInt
      val sizeLengths = b.get().toInt
      require(sizeOffsets == 8 && sizeLengths == 8,
        s"offset/length sizes $sizeOffsets/$sizeLengths unsupported (8/8 only)")
      b.get() // reserved
      b.getShort(); b.getShort() // group leaf k, group internal k
      b.getInt() // consistency flags
      if (version == 1) { b.getShort(); b.getShort() } // indexed-storage k
      val base = b.getLong()
      b.getLong() // free space address
      b.getLong() // end of file address
      b.getLong() // driver info address
      // root group symbol table entry
      b.getLong() // link name offset
      val rootHeader = b.getLong()
      val cacheType = b.getInt()
      b.getInt() // reserved
      val s0 = b.getLong(); val s1 = b.getLong() // scratch
      val (bt, hp) =
        if (cacheType == 1) (s0, s1)
        else {
          val msgs = readObjectHeader(base + rootHeader)
          msgs.collectFirst { case SymbolTableMsg(btr, heap) => (btr, heap) }
            .getOrElse(throw new IllegalStateException("root group has no symbol table"))
        }
      Superblock(version, base, rootHeader, bt, hp)
    }

    // ---- object headers -------------------------------------------------

    private sealed trait Msg
    private case class DataspaceMsg(dims: Seq[Long]) extends Msg
    private case class DatatypeMsg(clazz: Int, size: Int, littleEndian: Boolean) extends Msg
    private case class AttributeMsg(attr: H5Attr) extends Msg
    private case class LayoutContiguous(addr: Long, size: Long) extends Msg
    private case class LayoutChunked(btree: Long, chunkDims: Seq[Int], elemSize: Int) extends Msg
    private case class LayoutCompact(data: Array[Byte]) extends Msg
    private case class FilterMsg(filters: Seq[(Int, Seq[Int])]) extends Msg // (id, client data)
    private case class SymbolTableMsg(btree: Long, heap: Long) extends Msg

    private def readObjectHeader(addr: Long): Seq[Msg] = {
      val b = buf(addr)
      val version = b.get().toInt
      require(version == 1,
        s"object header version $version unsupported (v1 only — classic format)")
      b.get() // reserved
      val nMsgs = b.getShort() & 0xFFFF
      b.getInt() // reference count
      val headerSize = b.getInt().toLong // byte size of the FIRST message block
      b.getInt() // 4-byte padding: v1 message block is 8-byte aligned
      val out = Seq.newBuilder[Msg]
      var remaining = nMsgs
      // FIFO of (position, byte budget): first block from the prefix,
      // continuation blocks appended in encounter order (their messages
      // count toward nMsgs; gaps are NIL messages)
      var blocks = Vector((b.position().toLong, headerSize))
      while (remaining > 0 && blocks.nonEmpty) {
        val (pos, budget) = blocks.head
        blocks = blocks.tail
        val mb = buf(pos)
        var bytesLeft = budget
        while (remaining > 0 && bytesLeft >= 8) {
          val mType = mb.getShort() & 0xFFFF
          val mSize = mb.getShort() & 0xFFFF
          mb.get(); mb.get(); mb.get(); mb.get() // flags + reserved
          val bodyPos = mb.position()
          mType match {
            case 0x0000 => // NIL
            case 0x0001 => out += parseDataspace(mb)
            case 0x0003 => out += parseDatatype(mb)
            case 0x0008 => out += parseLayout(mb)
            case 0x000B => out += parseFilters(mb)
            case 0x000C => parseAttribute(mb).foreach(a => out += AttributeMsg(a))
            case 0x0010 =>
              val cOff = mb.getLong(); val cLen = mb.getLong()
              blocks = blocks :+ ((sb.base + cOff, cLen))
            case 0x0011 =>
              out += SymbolTableMsg(mb.getLong(), mb.getLong())
            case _ => // attribute / fill / mtime / etc — not needed
          }
          mb.position(bodyPos + mSize)
          remaining -= 1
          bytesLeft -= 8 + mSize
        }
      }
      out.result()
    }

    private def parseDataspace(b: ByteBuffer): DataspaceMsg = {
      val version = b.get().toInt
      val rank = b.get().toInt
      val flags = b.get().toInt
      if (version == 1) { b.get(); b.getInt() } // reserved ×5
      else b.get() // v2: type byte
      val dims = (0 until rank).map(_ => b.getLong())
      if ((flags & 1) != 0) (0 until rank).foreach(_ => b.getLong()) // maxdims
      DataspaceMsg(dims)
    }

    private def parseDatatype(b: ByteBuffer): DatatypeMsg = {
      val classVer = b.get() & 0xFF
      val clazz = classVer & 0x0F
      val bits0 = b.get() & 0xFF
      b.get(); b.get() // bit fields 1-2
      val size = b.getInt()
      DatatypeMsg(clazz, size, littleEndian = (bits0 & 1) == 0)
    }

    private def parseLayout(b: ByteBuffer): Msg = {
      val version = b.get().toInt
      require(version == 3,
        s"data layout message version $version unsupported (v3 only)")
      val clazz = b.get().toInt
      clazz match {
        case 0 =>
          val n = b.getShort() & 0xFFFF
          val d = new Array[Byte](n); b.get(d)
          LayoutCompact(d)
        case 1 =>
          LayoutContiguous(b.getLong(), b.getLong())
        case 2 =>
          val dimensionality = b.get().toInt // rank + 1
          val btree = b.getLong()
          val dims = (0 until dimensionality).map(_ => b.getInt())
          // last "dimension" is the element size in bytes (spec IV.A.2.i)
          LayoutChunked(btree, dims.dropRight(1), dims.last)
        case other =>
          throw new IllegalArgumentException(s"layout class $other unsupported")
      }
    }

    /** V1 attribute message: (name, datatype, dataspace) headers each
      * padded to 8 bytes, then raw data. Decodes scalar/vector numerics
      * and fixed-length strings — the CF metadata set (`units`,
      * `scale_factor`, `add_offset`, `_FillValue`, `CLASS`). Exotic
      * payloads (vlen, references — e.g. netCDF-4's DIMENSION_LIST)
      * are skipped, not errors. */
    private def parseAttribute(b: ByteBuffer): Option[H5Attr] = {
      val version = b.get().toInt
      if (version != 1) return None
      b.get() // reserved
      val nameSize = b.getShort() & 0xFFFF
      val dtSize = b.getShort() & 0xFFFF
      val dsSize = b.getShort() & 0xFFFF
      def pad8(n: Int): Int = (n + 7) & ~7
      val nameRaw = new Array[Byte](pad8(nameSize)); b.get(nameRaw)
      val name = new String(nameRaw, 0, math.max(0, nameSize - 1), "UTF-8")
        .takeWhile(_ != 0)
      val dtPos = b.position()
      val dtype = parseDatatype(b)
      b.position(dtPos + pad8(dtSize))
      val dsPos = b.position()
      val space = parseDataspace(b)
      b.position(dsPos + pad8(dsSize))
      val n = if (space.dims.isEmpty) 1 else space.dims.product.toInt
      dtype.clazz match {
        case 3 => // string (fixed length)
          val raw = new Array[Byte](dtype.size * n); b.get(raw)
          Some(H5Attr(name, new String(raw, "UTF-8").takeWhile(_ != 0), Nil))
        case 0 | 1 =>
          val raw = new Array[Byte](dtype.size * n); b.get(raw)
          val vb = ByteBuffer.wrap(raw).order(
            if (dtype.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
          val nums = (0 until n).map(i => (dtype.clazz, dtype.size) match {
            case (1, 4) => vb.getFloat(i * 4).toDouble
            case (1, 8) => vb.getDouble(i * 8)
            case (0, 1) => raw(i).toDouble
            case (0, 2) => vb.getShort(i * 2).toDouble
            case (0, 4) => vb.getInt(i * 4).toDouble
            case (0, 8) => vb.getLong(i * 8).toDouble
            case _ => Double.NaN
          })
          Some(H5Attr(name, "", nums))
        case _ => None // vlen/reference/compound — not CF metadata
      }
    }

    private def parseFilters(b: ByteBuffer): FilterMsg = {
      val version = b.get().toInt
      val nf = b.get() & 0xFF
      if (version == 1) { b.getShort(); b.getInt() } // reserved ×6
      val fs = (0 until nf).map { _ =>
        val id = b.getShort() & 0xFFFF
        val nameLen =
          if (version == 1 || id >= 256) b.getShort() & 0xFFFF else 0
        b.getShort() // flags
        val ncdv = b.getShort() & 0xFFFF
        if (nameLen > 0) {
          val padded = if (version == 1) (nameLen + 7) & ~7 else nameLen
          b.position(b.position() + padded)
        }
        val cd = (0 until ncdv).map(_ => b.getInt())
        if (version == 1 && ncdv % 2 == 1) b.getInt() // pad to 8
        (id, cd)
      }
      FilterMsg(fs)
    }

    // ---- groups ---------------------------------------------------------

    private def heapString(heapAddr: Long, nameOff: Long): String = {
      val hb = buf(sb.base + heapAddr)
      require(hb.get() == 'H' && hb.get() == 'E' && hb.get() == 'A' && hb.get() == 'P',
        "bad local heap signature")
      hb.get(); hb.get(); hb.get(); hb.get() // version + reserved
      hb.getLong(); hb.getLong() // data size, free-list head
      val dataAddr = hb.getLong()
      var p = (sb.base + dataAddr + nameOff).toInt
      val s = new StringBuilder
      while (bytes(p) != 0) { s.append(bytes(p).toChar); p += 1 }
      s.toString()
    }

    /** All (name, object header address) entries of a group B-tree. */
    private def groupEntries(btree: Long, heap: Long): Seq[(String, Long)] = {
      def walkNode(addr: Long): Seq[(String, Long)] = {
        val b = buf(sb.base + addr)
        require(b.get() == 'T' && b.get() == 'R' && b.get() == 'E' && b.get() == 'E',
          "bad B-tree signature")
        val nodeType = b.get().toInt
        require(nodeType == 0, s"B-tree node type $nodeType in group traversal")
        val level = b.get().toInt
        val n = b.getShort() & 0xFFFF
        b.getLong(); b.getLong() // siblings
        // keys and children alternate: key0 child0 key1 ... childN-1 keyN
        val children = new Array[Long](n)
        b.getLong() // key 0
        (0 until n).foreach { i =>
          children(i) = b.getLong()
          b.getLong() // key i+1
        }
        if (level > 0) children.toSeq.flatMap(walkNode)
        else children.toSeq.flatMap(readSnod)
      }
      def readSnod(addr: Long): Seq[(String, Long)] = {
        val b = buf(sb.base + addr)
        require(b.get() == 'S' && b.get() == 'N' && b.get() == 'O' && b.get() == 'D',
          "bad symbol node signature")
        b.get() // version
        b.get() // reserved
        val n = b.getShort() & 0xFFFF
        (0 until n).map { _ =>
          val nameOff = b.getLong()
          val header = b.getLong()
          b.getInt(); b.getInt() // cache type + reserved
          b.getLong(); b.getLong() // scratch
          (heapString(heap, nameOff), header)
        }
      }
      walkNode(btree)
    }

    private def resolveGroup(header: Long): (Long, Long) = {
      readObjectHeader(sb.base + header)
        .collectFirst { case SymbolTableMsg(bt, hp) => (bt, hp) }
        .getOrElse(throw new IllegalArgumentException("object is not a group"))
    }

    private def lookup(path: String): Long = {
      val parts = path.split("/").filter(_.nonEmpty)
      var (bt, hp) = (sb.rootBtree, sb.rootHeap)
      var header = sb.rootHeaderAddr
      parts.foreach { part =>
        val entries = groupEntries(bt, hp)
        val next = entries.find(_._1 == part).getOrElse(
          throw new NoSuchElementException(
            s"path component '$part' not found; siblings: ${entries.map(_._1).mkString(", ")}"))
        header = next._2
        if (part != parts.last || isGroup(header)) {
          val g = resolveGroup(header); bt = g._1; hp = g._2
        }
      }
      header
    }

    private def isGroup(header: Long): Boolean =
      readObjectHeader(sb.base + header).exists(_.isInstanceOf[SymbolTableMsg])

    /** Child names of the group at `path` ("/" = root), sorted. */
    def list(path: String): Seq[String] = {
      val (bt, hp) =
        if (path == "/" || path.isEmpty) (sb.rootBtree, sb.rootHeap)
        else resolveGroup(lookup(path))
      groupEntries(bt, hp).map(_._1).sorted
    }

    def exists(path: String): Boolean =
      try { lookup(path); true } catch { case _: NoSuchElementException => false }

    /** Attributes of the object (group or dataset) at `path`. */
    def attributes(path: String): Seq[H5Attr] =
      readObjectHeader(sb.base + lookup(path))
        .collect { case AttributeMsg(a) => a }

    /** Shape of the dataset at `path` WITHOUT reading its data. */
    def datasetDims(path: String): Seq[Int] =
      readObjectHeader(sb.base + lookup(path))
        .collectFirst { case d: DataspaceMsg => d.dims.map(_.toInt) }
        .getOrElse(throw new IllegalArgumentException(s"$path: no dataspace"))

    // ---- datasets -------------------------------------------------------

    /** Read the dataset at `path` as row-major doubles. */
    def readDataset(path: String): Dataset = {
      val msgs = readObjectHeader(sb.base + lookup(path))
      val space = msgs.collectFirst { case d: DataspaceMsg => d }
        .getOrElse(throw new IllegalArgumentException(s"$path: no dataspace (a group?)"))
      val dtype = msgs.collectFirst { case d: DatatypeMsg => d }
        .getOrElse(throw new IllegalArgumentException(s"$path: no datatype"))
      require(dtype.clazz == 0 || dtype.clazz == 1 ||
        (dtype.clazz == 3 && dtype.size == 1),
        s"$path: datatype class ${dtype.clazz} unsupported (fixed/float/char only)")
      val filters = msgs.collectFirst { case FilterMsg(f) => f }.getOrElse(Nil)
      val dims = space.dims.map(_.toInt)
      val n = if (dims.isEmpty) 1 else dims.product
      val out = new Array[Double](n)

      def decode(raw: Array[Byte], count: Int, into: Int): Unit = {
        val vb = ByteBuffer.wrap(raw).order(
          if (dtype.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
        var i = 0
        while (i < count) {
          out(into + i) = (dtype.clazz, dtype.size) match {
            case (1, 4) => vb.getFloat(i * 4).toDouble
            case (1, 8) => vb.getDouble(i * 8)
            case (0, 1) => raw(i).toDouble
            case (0, 2) => vb.getShort(i * 2).toDouble
            case (0, 4) => vb.getInt(i * 4).toDouble
            case (0, 8) => vb.getLong(i * 8).toDouble
            case (3, 1) => (raw(i) & 0xFF).toDouble // NC_CHAR cell
            case other => throw new IllegalArgumentException(
              s"$path: datatype $other unsupported")
          }
          i += 1
        }
      }

      msgs.collectFirst {
        case l: LayoutContiguous => l
        case l: LayoutChunked => l
        case l: LayoutCompact => l
      } match {
        case Some(LayoutCompact(data)) => decode(data, n, 0)
        case Some(LayoutContiguous(addr, _)) =>
          require(addr != Undef, s"$path: data not allocated")
          val raw = new Array[Byte](n * dtype.size)
          System.arraycopy(bytes, (sb.base + addr).toInt, raw, 0, raw.length)
          decode(raw, n, 0)
        case Some(LayoutChunked(btree, chunkDims, elemSize)) =>
          require(elemSize == dtype.size,
            s"$path: chunk element size $elemSize != datatype size ${dtype.size}")
          if (btree != Undef)
            readChunks(path, btree, dims, chunkDims, elemSize, filters, dtype, out)
        case _ => throw new IllegalArgumentException(s"$path: no data layout")
      }
      Dataset(dims, out)
    }

    /** Walk the v1 chunk B-tree and scatter each (filtered) chunk into
      * the row-major output. */
    private def readChunks(
        path: String,
        btree: Long,
        dims: Seq[Int],
        chunkDims: Seq[Int],
        elemSize: Int,
        filters: Seq[(Int, Seq[Int])],
        dtype: DatatypeMsg,
        out: Array[Double]): Unit = {
      val rank = dims.length

      def walk(addr: Long): Unit = {
        val b = buf(sb.base + addr)
        require(b.get() == 'T' && b.get() == 'R' && b.get() == 'E' && b.get() == 'E',
          s"$path: bad chunk B-tree signature")
        val nodeType = b.get().toInt
        require(nodeType == 1, s"$path: B-tree node type $nodeType in chunk index")
        val level = b.get().toInt
        val n = b.getShort() & 0xFFFF
        b.getLong(); b.getLong() // siblings
        // key: chunk size (4) + filter mask (4) + (rank+1) offsets (8 each)
        def readKey(): (Int, Int, Array[Long]) = {
          val sz = b.getInt(); val mask = b.getInt()
          val off = Array.fill(rank + 1)(b.getLong())
          (sz, mask, off)
        }
        var i = 0
        var key = readKey()
        while (i < n) {
          val child = b.getLong()
          if (level > 0) {
            val save = b.position()
            walk(child)
            b.position(save)
          } else {
            copyChunk(key._1, key._2, key._3, child)
          }
          key = readKey()
          i += 1
        }
      }

      def copyChunk(storedSize: Int, filterMask: Int, offsets: Array[Long], addr: Long): Unit = {
        var raw = new Array[Byte](storedSize)
        System.arraycopy(bytes, (sb.base + addr).toInt, raw, 0, storedSize)
        // filters listed in write order — undo in reverse; mask bit i set
        // means filter i was skipped for this chunk
        filters.zipWithIndex.reverse.foreach { case ((id, cd), idx) =>
          if ((filterMask & (1 << idx)) == 0) raw = id match {
            case 1 => inflate(raw, chunkDims.product * elemSize)
            case 2 => unshuffle(raw, cd.headOption.getOrElse(elemSize))
            case 3 => raw.dropRight(4) // fletcher32: checksum trails the data
            case other => throw new IllegalArgumentException(
              s"$path: filter id $other unsupported (deflate/shuffle/fletcher32)")
          }
        }
        val vb = ByteBuffer.wrap(raw).order(
          if (dtype.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
        // scatter the chunk (full chunk shape, clipped at dataset edges)
        val cShape = chunkDims.toArray
        val total = cShape.product
        val idx = new Array[Int](rank)
        var flat = 0
        while (flat < total) {
          // position within chunk -> absolute index
          var ok = true
          var outPos = 0L
          var d = 0
          while (d < rank) {
            val abs = offsets(d) + idx(d)
            if (abs >= dims(d)) { ok = false; d = rank }
            else { outPos = outPos * dims(d) + abs; d += 1 }
          }
          if (ok) out(outPos.toInt) = (dtype.clazz, elemSize) match {
            case (1, 4) => vb.getFloat(flat * 4).toDouble
            case (1, 8) => vb.getDouble(flat * 8)
            case (0, 1) => raw(flat).toDouble
            case (0, 2) => vb.getShort(flat * 2).toDouble
            case (0, 4) => vb.getInt(flat * 4).toDouble
            case (0, 8) => vb.getLong(flat * 8).toDouble
            case other => throw new IllegalArgumentException(
              s"$path: datatype $other unsupported")
          }
          // increment chunk-local odometer
          var d2 = rank - 1
          while (d2 >= 0) {
            idx(d2) += 1
            if (idx(d2) < cShape(d2)) d2 = -1
            else { idx(d2) = 0; d2 -= 1 }
          }
          flat += 1
        }
      }

      walk(btree)
    }

    private def inflate(raw: Array[Byte], expected: Int): Array[Byte] = {
      val inf = new java.util.zip.Inflater()
      inf.setInput(raw)
      val out = new Array[Byte](expected)
      var off = 0
      while (!inf.finished() && off < expected)
        off += inf.inflate(out, off, expected - off)
      inf.end()
      if (off == expected) out else out.take(off)
    }

    /** Undo the byte-shuffle filter: on disk all first bytes of every
      * element, then all second bytes, ... */
    private def unshuffle(raw: Array[Byte], elemSize: Int): Array[Byte] = {
      if (elemSize <= 1) return raw
      val n = raw.length / elemSize
      val out = new Array[Byte](raw.length)
      var j = 0
      while (j < elemSize) {
        var i = 0
        while (i < n) {
          out(i * elemSize + j) = raw(j * n + i)
          i += 1
        }
        j += 1
      }
      // trailing bytes not divisible by elemSize pass through untouched
      var t = n * elemSize
      while (t < raw.length) { out(t) = raw(t); t += 1 }
      out
    }
  }
}
