package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM reader for the HDF5 binary format — the "classic" subset
  * that libhdf5 writes by default (libver "earliest", the layout of
  * every GFED4 distribution and of netCDF-4 files produced without
  * new-format flags) PLUS the common "new-format" subset that
  * `libver='latest'` writers produce: version-0/1 superblock with
  * old-style groups (v1 B-tree over SNOD symbol-table nodes + local
  * heap names) and v1 object headers with continuation blocks;
  * version-2/3 superblock with v2 ("OHDR") object headers,
  * compact-storage Link messages, and Jenkins-lookup3-checksummed
  * header chunks; contiguous, compact and chunked dataset layouts
  * (v1 B-tree chunk index for layout v3; single-chunk, implicit and
  * fixed-array chunk indexes for layout v4), and the three ubiquitous
  * filters — deflate (via `java.util.zip.Inflater`), shuffle,
  * fletcher32.
  *
  * Everything implements the publicly documented HDF5 File Format
  * Specification (HDF Group, format spec: superblock §II, symbol
  * table/B-tree/heap/fixed array §III, object headers §IV, datatype/
  * dataspace/link/layout/filter messages §IV.A). No library code
  * involved.
  *
  * This closes the S3 container gap recorded since round 2: the
  * reference reads GFED4 through xarray/h5py
  * (emiproc/inventories/gfed.py:104-240, `phony_dims="sort"` = plain
  * HDF5 groups without netCDF metadata); those files are exactly the
  * classic subset. The remaining new-format structures a rarely-hit
  * file could still carry — dense (fractal-heap) link storage, the
  * extensible-array and v2-B-tree chunk indexes that only appear with
  * unlimited dimensions — raise with a clear message; `h5repack -L`
  * converts them.
  *
  * Driver-side by design, like [[NetcdfClassic]]: headers are tiny and
  * one file's arrays are grid-sized. The 100 TB path is many files ×
  * partitions via `binaryFile` + `mapPartitions` — the parser is pure
  * and serializable.
  *
  * Validation honesty: the CLASSIC subset is pinned against real
  * libhdf5-written files (the committed GFED4 fixture lineage). The
  * NEW-FORMAT subset is validated against this repo's own spec-derived
  * fixture writer (Hdf5NewFormatSpec: structural round-trips plus real
  * Jenkins-lookup3 checksums) — no independent producer exists in this
  * offline environment (no h5py/libhdf5). A shared misreading of the
  * format spec would therefore round-trip; before trusting the
  * new-format path on production `libver='latest'` files, pin one
  * h5py-written fixture. Until then any structural surprise fails
  * loudly (checksum/sentinel checks), never silently.
  */
object Hdf5Classic {

  /** Bob Jenkins' lookup3 `hashlittle` (public domain; the checksum the
    * HDF5 format uses for all new-format metadata blocks). Exposed to
    * the fixture writer so specs encode REAL checksums and the reader's
    * verification is exercised end-to-end. */
  private[graft] def lookup3(data: Array[Byte], from: Int, until: Int): Int = {
    def rot(x: Int, k: Int): Int = (x << k) | (x >>> (32 - k))
    val length = until - from
    var a = 0xdeadbeef + length
    var b = a
    var c = a
    var off = from
    var len = length
    def word(o: Int, n: Int): Int = {
      var w = 0
      var i = 0
      while (i < n) { w |= (data(o + i) & 0xFF) << (8 * i); i += 1 }
      w
    }
    while (len > 12) {
      a += word(off, 4); b += word(off + 4, 4); c += word(off + 8, 4)
      a -= c; a ^= rot(c, 4); c += b
      b -= a; b ^= rot(a, 6); a += c
      c -= b; c ^= rot(b, 8); b += a
      a -= c; a ^= rot(c, 16); c += b
      b -= a; b ^= rot(a, 19); a += c
      c -= b; c ^= rot(b, 4); b += a
      off += 12; len -= 12
    }
    if (len > 0) {
      a += word(off, math.min(len, 4))
      if (len > 4) b += word(off + 4, math.min(len - 4, 4))
      if (len > 8) c += word(off + 8, len - 8)
      c ^= b; c -= rot(b, 14)
      a ^= c; a -= rot(c, 11)
      b ^= a; b -= rot(a, 25)
      c ^= b; c -= rot(b, 16)
      a ^= c; a -= rot(c, 4)
      b ^= a; b -= rot(a, 14)
      c ^= b; c -= rot(b, 24)
    }
    c
  }

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

    private case class Superblock(version: Int, base: Long, rootHeaderAddr: Long)

    /** Verify the lookup3 checksum stored at `end` over `[start, end)`
      * — the integrity scheme of EVERY new-format metadata block. */
    private def checksum(start: Long, end: Long, what: String): Unit = {
      val stored = buf(end).getInt()
      val computed = lookup3(bytes, start.toInt, end.toInt)
      require(stored == computed,
        f"$what: checksum mismatch (stored 0x$stored%08x, computed 0x$computed%08x)")
    }

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
      require(version >= 0 && version <= 3,
        s"HDF5 superblock version $version unsupported (v0-v3 only)")
      if (version >= 2) {
        // v2/v3 (§II.A.2): sizes, flags, four addresses, checksum — the
        // root group is an object header address directly (no symbol
        // table entry; links live in the root header's messages)
        val sizeOffsets = b.get().toInt
        val sizeLengths = b.get().toInt
        require(sizeOffsets == 8 && sizeLengths == 8,
          s"offset/length sizes $sizeOffsets/$sizeLengths unsupported (8/8 only)")
        b.get() // file consistency flags
        val base = b.getLong()
        b.getLong() // superblock extension address
        b.getLong() // end of file address
        val rootHeader = b.getLong()
        checksum(off, off + 44, "superblock")
        Superblock(version, base, rootHeader)
      } else {
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
        Superblock(version, base, rootHeader)
      }
    }

    // ---- object headers -------------------------------------------------

    private sealed trait Msg
    private case class DataspaceMsg(dims: Seq[Long]) extends Msg
    private case class DatatypeMsg(clazz: Int, size: Int, littleEndian: Boolean) extends Msg
    private case class AttributeMsg(attr: H5Attr) extends Msg
    private case class LayoutContiguous(addr: Long, size: Long) extends Msg
    private case class LayoutChunked(btree: Long, chunkDims: Seq[Int], elemSize: Int) extends Msg
    private case class LayoutCompact(data: Array[Byte]) extends Msg
    // layout v4 chunk indexes (new format, §IV.A.2.i version 4)
    private case class LayoutSingleChunk(
        addr: Long, chunkDims: Seq[Int], elemSize: Int,
        storedSize: Long, filterMask: Int) extends Msg
    private case class LayoutImplicit(
        addr: Long, chunkDims: Seq[Int], elemSize: Int) extends Msg
    private case class LayoutFixedArray(
        faHeader: Long, chunkDims: Seq[Int], elemSize: Int) extends Msg
    private case class FilterMsg(filters: Seq[(Int, Seq[Int])]) extends Msg // (id, client data)
    private case class SymbolTableMsg(btree: Long, heap: Long) extends Msg
    // new-format group storage (§IV.A.2.c/g)
    private case class LinkMsg(name: String, header: Long) extends Msg
    private case class LinkInfoMsg(fractalHeap: Long) extends Msg
    private case object GroupInfoMsg extends Msg

    /** Message-type dispatch shared by the v1 and v2 header walkers
      * (type codes are identical; only the framing differs). */
    private def parseMessage(
        mType: Int, mb: ByteBuffer,
        out: scala.collection.mutable.Builder[Msg, Seq[Msg]],
        onContinuation: (Long, Long) => Unit): Unit = mType match {
      case 0x0000 => // NIL
      case 0x0001 => out += parseDataspace(mb)
      case 0x0002 => out += parseLinkInfo(mb)
      case 0x0003 => out += parseDatatype(mb)
      case 0x0006 => parseLink(mb).foreach(out += _)
      case 0x0008 => out += parseLayout(mb)
      case 0x000A => out += GroupInfoMsg
      case 0x000B => out += parseFilters(mb)
      case 0x000C => parseAttribute(mb).foreach(a => out += AttributeMsg(a))
      case 0x0010 =>
        val cOff = mb.getLong(); val cLen = mb.getLong()
        onContinuation(cOff, cLen)
      case 0x0011 =>
        out += SymbolTableMsg(mb.getLong(), mb.getLong())
      case _ => // fill / mtime / attribute-info / etc — not needed
    }

    private def readObjectHeader(addr: Long): Seq[Msg] =
      // v2 headers lead with the "OHDR" signature; v1 with version byte 1
      if (bytes(addr.toInt) == 'O') readObjectHeaderV2(addr)
      else readObjectHeaderV1(addr)

    private def readObjectHeaderV1(addr: Long): Seq[Msg] = {
      val b = buf(addr)
      val version = b.get().toInt
      require(version == 1,
        s"object header version $version unsupported (v1/v2 only)")
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
          parseMessage(mType, mb, out,
            (cOff, cLen) => blocks = blocks :+ ((sb.base + cOff, cLen)))
          mb.position(bodyPos + mSize)
          remaining -= 1
          bytesLeft -= 8 + mSize
        }
      }
      out.result()
    }

    /** V2 ("OHDR") object header: no message count — each chunk's byte
      * budget is walked until less than a message header remains (the
      * gap); every chunk carries a lookup3 checksum which is VERIFIED.
      * Continuation blocks are "OCHK"-signed with their own checksum. */
    private def readObjectHeaderV2(addr: Long): Seq[Msg] = {
      val b = buf(addr)
      require(b.get() == 'O' && b.get() == 'H' && b.get() == 'D' && b.get() == 'R',
        "bad OHDR signature")
      val version = b.get().toInt
      require(version == 2, s"OHDR version $version unsupported (v2 only)")
      val flags = b.get() & 0xFF
      if ((flags & 0x20) != 0) b.position(b.position() + 16) // 4 timestamps
      if ((flags & 0x10) != 0) b.position(b.position() + 4) // attr phase change
      val chunk0 = (flags & 3) match {
        case 0 => b.get() & 0xFFL
        case 1 => b.getShort() & 0xFFFFL
        case 2 => b.getInt() & 0xFFFFFFFFL
        case _ => b.getLong()
      }
      val tracked = (flags & 4) != 0 // message creation order present
      val hdrSize = if (tracked) 6 else 4
      val out = Seq.newBuilder[Msg]
      // (messagesStart, messagesLen, checksumCoverStart)
      var blocks = Vector((b.position().toLong, chunk0, addr))
      while (blocks.nonEmpty) {
        val (pos, budget, coverStart) = blocks.head
        blocks = blocks.tail
        checksum(coverStart, pos + budget, s"object header at $addr")
        val mb = buf(pos)
        var bytesLeft = budget
        while (bytesLeft >= hdrSize) {
          val mType = mb.get() & 0xFF
          val mSize = mb.getShort() & 0xFFFF
          mb.get() // message flags
          if (tracked) mb.getShort()
          val bodyPos = mb.position()
          parseMessage(mType, mb, out, (cOff, cLen) => {
            // OCHK block: signature(4) + messages + checksum(4); the
            // continuation length INCLUDES both
            val cAddr = sb.base + cOff
            require(bytes(cAddr.toInt) == 'O' && bytes(cAddr.toInt + 1) == 'C' &&
              bytes(cAddr.toInt + 2) == 'H' && bytes(cAddr.toInt + 3) == 'K',
              "bad OCHK signature")
            blocks = blocks :+ ((cAddr + 4, cLen - 8, cAddr))
          })
          mb.position(bodyPos + mSize)
          bytesLeft -= hdrSize + mSize
        }
      }
      out.result()
    }

    /** Link message (§IV.A.2.g) — one compact-storage group entry.
      * Soft/external links are skipped (not object children). */
    private def parseLink(b: ByteBuffer): Option[LinkMsg] = {
      val version = b.get().toInt
      require(version == 1, s"link message version $version unsupported")
      val flags = b.get() & 0xFF
      val linkType = if ((flags & 8) != 0) b.get() & 0xFF else 0
      if ((flags & 4) != 0) b.getLong() // creation order
      if ((flags & 0x10) != 0) b.get() // name character set
      val nameLen = (flags & 3) match {
        case 0 => (b.get() & 0xFF).toLong
        case 1 => (b.getShort() & 0xFFFF).toLong
        case 2 => b.getInt() & 0xFFFFFFFFL
        case _ => b.getLong()
      }
      val nm = new Array[Byte](nameLen.toInt); b.get(nm)
      if (linkType == 0) Some(LinkMsg(new String(nm, "UTF-8"), b.getLong()))
      else None
    }

    /** Link Info message (§IV.A.2.c): when the fractal heap address is
      * defined the group's links moved to DENSE storage — unsupported
      * (loud), `h5repack -L` converts. Undefined = compact links. */
    private def parseLinkInfo(b: ByteBuffer): LinkInfoMsg = {
      val version = b.get().toInt
      require(version == 0, s"link info version $version unsupported")
      val flags = b.get() & 0xFF
      if ((flags & 1) != 0) b.getLong() // max creation index
      val fheap = b.getLong()
      b.getLong() // name-index v2 B-tree address
      if ((flags & 2) != 0) b.getLong() // creation-order index address
      LinkInfoMsg(fheap)
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
      require(version == 3 || version == 4,
        s"data layout message version $version unsupported (v3/v4 only)")
      val clazz = b.get().toInt
      clazz match {
        case 0 =>
          val n = b.getShort() & 0xFFFF
          val d = new Array[Byte](n); b.get(d)
          LayoutCompact(d)
        case 1 =>
          LayoutContiguous(b.getLong(), b.getLong())
        case 2 if version == 3 =>
          val dimensionality = b.get().toInt // rank + 1
          val btree = b.getLong()
          val dims = (0 until dimensionality).map(_ => b.getInt())
          // last "dimension" is the element size in bytes (spec IV.A.2.i)
          LayoutChunked(btree, dims.dropRight(1), dims.last)
        case 2 =>
          // v4 chunked (new format): variable-width chunk dims (the
          // libhdf5 convention keeps rank+1 dims with the element size
          // trailing, as in the v1-B-tree keys), then a chunk index
          val flags = b.get() & 0xFF
          val dimensionality = b.get().toInt // rank + 1
          val enc = b.get().toInt // bytes per encoded dim size
          def readVar(): Long = enc match {
            case 1 => b.get() & 0xFFL
            case 2 => b.getShort() & 0xFFFFL
            case 4 => b.getInt() & 0xFFFFFFFFL
            case _ => b.getLong()
          }
          val dims = (0 until dimensionality).map(_ => readVar().toInt)
          val chunkDims = dims.dropRight(1)
          val elemSize = dims.last
          val idxType = b.get().toInt
          idxType match {
            case 1 => // single chunk
              val (storedSize, mask) =
                if ((flags & 2) != 0) (readLen(b), b.getInt()) else (-1L, 0)
              LayoutSingleChunk(b.getLong(), chunkDims, elemSize, storedSize, mask)
            case 2 => // implicit: unfiltered chunks contiguous in grid order
              LayoutImplicit(b.getLong(), chunkDims, elemSize)
            case 3 => // fixed array
              b.get() // page bits (repeated authoritatively in the FA header)
              LayoutFixedArray(b.getLong(), chunkDims, elemSize)
            case other =>
              throw new IllegalArgumentException(
                s"chunk index type $other unsupported (single/implicit/fixed-array " +
                  "only — extensible-array and v2-B-tree indexes appear with " +
                  "unlimited dims; h5repack -L converts)")
          }
        case other =>
          throw new IllegalArgumentException(s"layout class $other unsupported")
      }
    }

    private def readLen(b: ByteBuffer): Long = b.getLong() // size-of-lengths = 8

    /** Attribute message. V1 (classic): (name, datatype, dataspace)
      * headers each padded to 8 bytes, then raw data. V2/V3 (new
      * format): a flags byte replaces the reserved byte, headers are
      * UNPADDED, and v3 adds a name-charset byte. Decodes scalar/vector
      * numerics and fixed-length strings — the CF metadata set
      * (`units`, `scale_factor`, `add_offset`, `_FillValue`, `CLASS`).
      * Exotic payloads (vlen, references, shared datatypes — e.g.
      * netCDF-4's DIMENSION_LIST) are skipped, not errors. */
    private def parseAttribute(b: ByteBuffer): Option[H5Attr] = {
      val version = b.get().toInt
      if (version != 1 && version != 2 && version != 3) return None
      val padded = version == 1
      val flags = b.get() & 0xFF // v1: reserved (0)
      if (!padded && (flags & 3) != 0) return None // shared datatype/dataspace
      val nameSize = b.getShort() & 0xFFFF
      val dtSize = b.getShort() & 0xFFFF
      val dsSize = b.getShort() & 0xFFFF
      if (version == 3) b.get() // name character set
      def pad8(n: Int): Int = if (padded) (n + 7) & ~7 else n
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

    /** All (name, object header address) children of the group whose
      * object header is at `header` — old-style (symbol-table message →
      * v1 B-tree + SNOD + local heap) and new-style (compact Link
      * messages) groups resolve through the same call; dense link
      * storage (fractal heap) is a loud unsupported. */
    private def childEntries(header: Long): Seq[(String, Long)] = {
      val msgs = readObjectHeader(sb.base + header)
      msgs.collectFirst { case SymbolTableMsg(bt, hp) => groupEntries(bt, hp) }
        .getOrElse {
          msgs.collectFirst { case LinkInfoMsg(fh) if fh != Undef => () }.foreach { _ =>
            throw new IllegalArgumentException(
              "dense link storage (fractal heap) unsupported — h5repack -L converts")
          }
          val links = msgs.collect { case LinkMsg(n, h) => (n, h) }
          require(links.nonEmpty ||
            msgs.exists(m => m == GroupInfoMsg || m.isInstanceOf[LinkInfoMsg]),
            "object is not a group")
          links
        }
    }

    private def lookup(path: String): Long = {
      val parts = path.split("/").filter(_.nonEmpty)
      var header = sb.rootHeaderAddr
      parts.foreach { part =>
        val entries = childEntries(header)
        header = entries.find(_._1 == part).getOrElse(
          throw new NoSuchElementException(
            s"path component '$part' not found; siblings: ${entries.map(_._1).mkString(", ")}"))._2
      }
      header
    }

    /** Child names of the group at `path` ("/" = root), sorted. */
    def list(path: String): Seq[String] =
      childEntries(if (path == "/" || path.isEmpty) sb.rootHeaderAddr else lookup(path))
        .map(_._1).sorted

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

      def grid(chunkDims: Seq[Int]): Seq[Array[Long]] = {
        // row-major chunk-grid origins (the chunk order of the implicit
        // and fixed-array indexes)
        val nChunks = dims.zip(chunkDims).map { case (d, c) => (d + c - 1) / c }
        (0 until nChunks.product).map { ci =>
          var rem = ci
          val coord = new Array[Long](dims.length)
          var k = dims.length - 1
          while (k >= 0) {
            coord(k) = (rem % nChunks(k)).toLong * chunkDims(k)
            rem /= nChunks(k); k -= 1
          }
          coord
        }
      }

      msgs.collectFirst {
        case l: LayoutContiguous => l
        case l: LayoutChunked => l
        case l: LayoutCompact => l
        case l: LayoutSingleChunk => l
        case l: LayoutImplicit => l
        case l: LayoutFixedArray => l
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
          if (btree != Undef) {
            val chunks = btreeChunks(path, btree, dims.length)
            materializeChunks(path, dims, chunkDims, elemSize, filters, dtype, out, chunks)
          }
        case Some(LayoutSingleChunk(addr, chunkDims, elemSize, storedSize, mask)) =>
          if (addr != Undef) {
            val sz =
              if (storedSize >= 0) storedSize.toInt
              else chunkDims.product * elemSize
            materializeChunks(path, dims, chunkDims, elemSize, filters, dtype, out,
              Seq(ChunkRef(new Array[Long](dims.length), sz, mask, addr)))
          }
        case Some(LayoutImplicit(addr, chunkDims, elemSize)) =>
          if (addr != Undef) {
            val chunkBytes = chunkDims.product * elemSize
            val chunks = grid(chunkDims).zipWithIndex.map { case (off, i) =>
              ChunkRef(off, chunkBytes, 0, addr + i.toLong * chunkBytes)
            }
            // the implicit index exists only for unfiltered datasets
            materializeChunks(path, dims, chunkDims, elemSize, Nil, dtype, out, chunks)
          }
        case Some(LayoutFixedArray(faHeader, chunkDims, elemSize)) =>
          if (faHeader != Undef) {
            val chunkBytes = chunkDims.product * elemSize
            val entries = fixedArrayEntries(path, faHeader)
            val origins = grid(chunkDims)
            require(entries.length == origins.length,
              s"$path: fixed array holds ${entries.length} entries for ${origins.length} chunks")
            val chunks = origins.zip(entries).collect {
              case (off, Some((addr, sz, mask))) =>
                ChunkRef(off, if (sz >= 0) sz.toInt else chunkBytes, mask, addr)
            }
            materializeChunks(path, dims, chunkDims, elemSize, filters, dtype, out, chunks)
          }
        case _ => throw new IllegalArgumentException(s"$path: no data layout")
      }
      Dataset(dims, out)
    }

    /** One stored chunk: grid origin, stored byte size, per-chunk filter
      * mask, absolute-in-file address (pre-base). */
    private case class ChunkRef(
        offsets: Array[Long], storedSize: Int, filterMask: Int, addr: Long)

    /** Fixed-array chunk index (§III.G, "FAHD"/"FADB"): per-chunk
      * entries in row-major grid order — address only (client 0,
      * unfiltered) or address+size+mask (client 1, filtered). Entries
      * either live inline in the data block or in sequential pages of
      * 2^pageBits entries, each page bitmap-gated and checksummed.
      * `None` = unallocated chunk (stays zero-filled). */
    private def fixedArrayEntries(
        path: String, faHeader: Long): Seq[Option[(Long, Long, Int)]] = {
      val b = buf(sb.base + faHeader)
      require(b.get() == 'F' && b.get() == 'A' && b.get() == 'H' && b.get() == 'D',
        s"$path: bad fixed-array header signature")
      require(b.get() == 0, s"$path: fixed-array header version unsupported")
      val clientId = b.get() & 0xFF // 0 unfiltered chunks, 1 filtered
      require(clientId == 0 || clientId == 1,
        s"$path: fixed-array client $clientId unsupported")
      val entrySize = b.get() & 0xFF
      val pageBits = b.get() & 0xFF
      val maxEntries = b.getLong()
      val dblkAddr = b.getLong()
      checksum(sb.base + faHeader, sb.base + faHeader + 24, s"$path fixed-array header")
      val db = buf(sb.base + dblkAddr)
      require(db.get() == 'F' && db.get() == 'A' && db.get() == 'D' && db.get() == 'B',
        s"$path: bad fixed-array data block signature")
      require(db.get() == 0, s"$path: fixed-array data block version unsupported")
      require((db.get() & 0xFF) == clientId, s"$path: fixed-array client mismatch")
      db.getLong() // back-pointer to the header
      val pageElems = 1L << pageBits
      val paged = maxEntries > pageElems
      def readEntry(eb: ByteBuffer): Option[(Long, Long, Int)] = {
        val addr = eb.getLong()
        val (sz, mask) =
          if (clientId == 1) {
            // chunk size is entrySize-12 bytes wide, then a 4-byte mask
            var s = 0L
            var i = 0
            val w = entrySize - 12
            while (i < w) { s |= (eb.get() & 0xFFL) << (8 * i); i += 1 }
            (s, eb.getInt())
          } else (-1L, 0)
        if (addr == Undef) None else Some((addr, sz, mask))
      }
      if (!paged) {
        val entries = (0L until maxEntries).map(_ => readEntry(db))
        checksum(sb.base + dblkAddr, sb.base + dblkAddr + 14 + maxEntries * entrySize,
          s"$path fixed-array data block")
        entries
      } else {
        val npages = ((maxEntries + pageElems - 1) / pageElems).toInt
        val bitmapBytes = (npages + 7) / 8
        val bitmap = new Array[Byte](bitmapBytes); db.get(bitmap)
        checksum(sb.base + dblkAddr, sb.base + dblkAddr + 14 + bitmapBytes,
          s"$path fixed-array data block")
        db.getInt() // the verified checksum
        val out = Seq.newBuilder[Option[(Long, Long, Int)]]
        var remaining = maxEntries
        (0 until npages).foreach { p =>
          val inPage = math.min(pageElems, remaining)
          val pageStart = db.position().toLong
          if ((bitmap(p / 8) & (1 << (p % 8))) != 0) {
            (0L until inPage).foreach(_ => out += readEntry(db))
            checksum(pageStart, pageStart + inPage * entrySize,
              s"$path fixed-array page $p")
          } else {
            (0L until inPage).foreach(_ => out += None) // uninitialized page
            db.position((pageStart + inPage * entrySize).toInt)
          }
          db.getInt() // page checksum
          remaining -= inPage
        }
        out.result()
      }
    }

    /** Walk the v1 chunk B-tree into chunk references. */
    private def btreeChunks(path: String, btree: Long, rank: Int): Seq[ChunkRef] = {
      val out = Seq.newBuilder[ChunkRef]
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
            out += ChunkRef(key._3.take(rank), key._1, key._2, child)
          }
          key = readKey()
          i += 1
        }
      }
      walk(btree)
      out.result()
    }

    /** Scatter each (possibly filtered) stored chunk into the row-major
      * output — shared by every chunk index (v1 B-tree, single,
      * implicit, fixed array). */
    private def materializeChunks(
        path: String,
        dims: Seq[Int],
        chunkDims: Seq[Int],
        elemSize: Int,
        filters: Seq[(Int, Seq[Int])],
        dtype: DatatypeMsg,
        out: Array[Double],
        chunks: Seq[ChunkRef]): Unit = {
      val rank = dims.length

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

      chunks.foreach(c => copyChunk(c.storedSize, c.filterMask, c.offsets, c.addr))
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
