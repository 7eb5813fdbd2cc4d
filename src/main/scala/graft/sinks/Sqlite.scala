package graft.sinks

import scala.collection.mutable.ArrayBuffer

/** Minimal pure-JVM SQLite database file writer + reader — just enough of
  * the public file format (sqlite.org/fileformat2.html) to produce real,
  * `sqlite3`-openable single-file databases from the driver, with zero
  * dependencies. Built for the GeoPackage sink ([[GeoPackage]], reference
  * `export_to_geopackage`, emiproc/exports/geopackage.py:9-60), whose
  * output container IS an SQLite database.
  *
  * Scope (everything else fails loudly, nothing is approximated):
  *  - rowid table b-trees of any depth (leaf 0x0d / interior 0x05 pages),
  *    streamed: rows append monotonically by rowid, finished pages are
  *    buffered so memory is O(file size), never O(Spark job);
  *  - single-leaf index b-trees (0x0a) for the tiny metadata PRIMARY
  *    KEY / UNIQUE autoindexes SQLite's schema parser expects;
  *  - record serial types NULL / int8..64 / float64 / 0 / 1 / text / blob;
  *  - no overflow pages: a row's payload must fit its page
  *    (`pageSize - 35`); the writer REQUIREs that with a raise-pageSize
  *    message (pageSize is settable up to 65536) instead of silently
  *    truncating;
  *  - no freelist, no WAL, no pointer-map (non-vacuum) — all legal for a
  *    freshly written read-mostly database.
  *
  * Determinism: same tables + rows ⇒ identical file bytes (fixed change
  * counter and header version constants), so exports can be pinned.
  */
object Sqlite {

  // ---- values

  sealed trait V
  case object VNull extends V
  final case class VInt(v: Long) extends V
  final case class VReal(v: Double) extends V
  final case class VText(v: String) extends V
  final case class VBlob(v: Array[Byte]) extends V

  /** An index over `cols` (0-based positions into the table's row values).
    * Written as a PRIMARY KEY/UNIQUE autoindex: `sql` stays NULL in
    * sqlite_master when `auto`, else the CREATE INDEX DDL is recorded. */
  final case class IndexDef(name: String, cols: Seq[Int], auto: Boolean = true,
      sql: String = null)

  /** One table: DDL recorded verbatim in sqlite_master; `rowidAlias` is
    * the column position declared INTEGER PRIMARY KEY (stored as NULL in
    * records, its value IS the rowid), -1 if none. */
  final case class TableDef(
      name: String,
      sql: String,
      rowidAlias: Int = -1,
      indexes: Seq[IndexDef] = Nil)

  // ---- varints and records

  private[sinks] def varint(v: Long): Array[Byte] = {
    if (v >= 0 && v < 0x80) return Array(v.toByte)
    val out = new ArrayBuffer[Byte](9)
    var x = v
    if (x < 0 || (x >>> 56) != 0) {
      // 9-byte form: 8 continuation bytes + full low byte
      val bytes = new Array[Byte](9)
      bytes(8) = (x & 0xff).toByte
      x >>= 8
      var i = 7
      while (i >= 0) { bytes(i) = ((x & 0x7f) | 0x80).toByte; x >>= 7; i -= 1 }
      return bytes
    }
    var tmp = List.empty[Byte]
    tmp = (x & 0x7f).toByte :: tmp
    x >>>= 7
    while (x != 0) { tmp = ((x & 0x7f) | 0x80).toByte :: tmp; x >>>= 7 }
    tmp.foreach(out += _)
    out.toArray
  }

  private def serialType(v: V): (Long, Int) = v match {
    case VNull => (0L, 0)
    case VInt(0) => (8L, 0)
    case VInt(1) => (9L, 0)
    case VInt(x) =>
      if (x >= Byte.MinValue && x <= Byte.MaxValue) (1L, 1)
      else if (x >= Short.MinValue && x <= Short.MaxValue) (2L, 2)
      else if (x >= -(1L << 23) && x < (1L << 23)) (3L, 3)
      else if (x >= Int.MinValue && x <= Int.MaxValue) (4L, 4)
      else if (x >= -(1L << 47) && x < (1L << 47)) (5L, 6)
      else (6L, 8)
    case VReal(_) => (7L, 8)
    case VText(s) => val n = s.getBytes("UTF-8").length; (13L + 2L * n, n)
    case VBlob(b) => (12L + 2L * b.length, b.length)
  }

  private def putValue(buf: ArrayBuffer[Byte], v: V, size: Int): Unit = v match {
    case VNull | VInt(0) | VInt(1) if size == 0 => ()
    case VInt(x) =>
      var i = size - 1
      while (i >= 0) { buf += ((x >> (8 * i)) & 0xff).toByte; i -= 1 }
    case VReal(d) =>
      val bits = java.lang.Double.doubleToLongBits(d)
      var i = 7
      while (i >= 0) { buf += ((bits >> (8 * i)) & 0xff).toByte; i -= 1 }
    case VText(s) => buf ++= s.getBytes("UTF-8")
    case VBlob(b) => buf ++= b
    case other => throw new IllegalStateException(s"bad value/size: $other/$size")
  }

  /** SQLite record: header (size varint + serial-type varints) + body. */
  private[sinks] def record(vals: Seq[V]): Array[Byte] = {
    val types = vals.map(serialType)
    val typeBytes = types.map { case (t, _) => varint(t) }
    val typesLen = typeBytes.map(_.length).sum
    // header length includes its own varint: solve hl = len(varint(hl)) + typesLen
    var headerLen = typesLen + 1
    while (varint(headerLen).length + typesLen != headerLen)
      headerLen = varint(headerLen).length + typesLen
    val out = new ArrayBuffer[Byte](headerLen + types.map(_._2).sum)
    out ++= varint(headerLen)
    typeBytes.foreach(out ++= _)
    vals.zip(types).foreach { case (v, (_, size)) => putValue(out, v, size) }
    out.toArray
  }

  // ---- page assembly

  /** One b-tree page being filled: cells append until full. */
  private final class PageBuilder(pageType: Int, pageSize: Int, headerOffset: Int) {
    val cells = new ArrayBuffer[Array[Byte]]()
    private val headerSize = if (pageType == 0x05 || pageType == 0x02) 12 else 8
    private var used = headerOffset + headerSize
    private var content = 0
    def fits(cell: Array[Byte]): Boolean =
      used + 2 * (cells.length + 1) + content + cell.length <= pageSize
    def add(cell: Array[Byte]): Unit = { cells += cell; content += cell.length }
    def nonEmpty: Boolean = cells.nonEmpty
    /** Render with an optional rightmost-child pointer (interior pages). */
    def render(rightChild: Int = 0): Array[Byte] = {
      val page = new Array[Byte](pageSize)
      val bb = java.nio.ByteBuffer.wrap(page)
      var off = pageSize
      val ptrs = cells.map { c => off -= c.length; System.arraycopy(c, 0, page, off, c.length); off }
      bb.position(headerOffset)
      bb.put(pageType.toByte).putShort(0).putShort(cells.length.toShort)
        .putShort(off.toShort).put(0.toByte)
      if (headerSize == 12) bb.putInt(rightChild)
      ptrs.foreach(p => bb.putShort(p.toShort))
      page
    }
  }

  /** Streaming rowid-table b-tree builder: feed (rowid, values) in rowid
    * order; finished leaf pages append to `pages` (global page list, page
    * number = index + 2); `finish()` builds the interior levels and
    * returns the root page number. */
  private final class TableTree(pages: ArrayBuffer[Array[Byte]], pageSize: Int,
      name: String) {
    private var leaf = new PageBuilder(0x0d, pageSize, 0)
    private val leafPages = new ArrayBuffer[(Int, Long)]() // (pageNo, maxRowid)
    private var lastRowid = Long.MinValue
    private var rowidOnLeaf = Long.MinValue

    private def flushLeaf(): Unit = if (leaf.nonEmpty) {
      pages += leaf.render()
      leafPages += ((pages.length + 1, rowidOnLeaf))
      leaf = new PageBuilder(0x0d, pageSize, 0)
    }

    def add(rowid: Long, vals: Seq[V]): Unit = {
      require(rowid > lastRowid, s"$name: rowids must be strictly increasing")
      lastRowid = rowid
      val payload = record(vals)
      require(payload.length <= pageSize - 35,
        s"$name: row payload ${payload.length} B exceeds the no-overflow " +
          s"limit ${pageSize - 35} B — raise pageSize (max 65536)")
      val cell = varint(payload.length) ++ varint(rowid) ++ payload
      if (!leaf.fits(cell)) flushLeaf()
      leaf.add(cell)
      rowidOnLeaf = rowid
    }

    def finish(): Int = {
      flushLeaf()
      if (leafPages.isEmpty) { // empty table: one empty leaf page
        pages += new PageBuilder(0x0d, pageSize, 0).render()
        return pages.length + 1
      }
      // conservative interior fan-out: cell = 4-byte child + ≤9-byte key,
      // 2-byte pointer each, 12-byte header
      val fanout = math.max(2, (pageSize - 12) / 15)
      var level = leafPages.toIndexedSeq
      while (level.length > 1) {
        level = level.grouped(fanout).map { group =>
          val pb = new PageBuilder(0x05, pageSize, 0)
          group.init.foreach { case (child, maxRowid) =>
            pb.add(java.nio.ByteBuffer.allocate(4).putInt(child).array() ++
              varint(maxRowid))
          }
          pages += pb.render(rightChild = group.last._1)
          (pages.length + 1, group.last._2)
        }.toIndexedSeq
      }
      level.head._1
    }
  }

  // SQLite binary-collation value order: NULL < numeric < text < blob.
  private def valueOrder(a: V, b: V): Int = {
    def rank(v: V) = v match {
      case VNull => 0
      case _: VInt | _: VReal => 1
      case _: VText => 2
      case _: VBlob => 3
    }
    val r = rank(a) - rank(b)
    if (r != 0) return r
    (a, b) match {
      case (VInt(x), VInt(y)) => java.lang.Long.compare(x, y)
      case (VReal(x), VReal(y)) => java.lang.Double.compare(x, y)
      case (VInt(x), VReal(y)) => java.lang.Double.compare(x.toDouble, y)
      case (VReal(x), VInt(y)) => java.lang.Double.compare(x, y.toDouble)
      case (VText(x), VText(y)) =>
        java.util.Arrays.compareUnsigned(x.getBytes("UTF-8"), y.getBytes("UTF-8"))
      case (VBlob(x), VBlob(y)) => java.util.Arrays.compareUnsigned(x, y)
      case _ => 0
    }
  }

  private def indexTree(pages: ArrayBuffer[Array[Byte]], pageSize: Int,
      idx: IndexDef, rows: Seq[(Long, Seq[V])]): Int = {
    val keyed = rows.map { case (rowid, vals) =>
      (idx.cols.map(vals(_)) :+ VInt(rowid), rowid)
    }.sortWith { case ((ka, _), (kb, _)) =>
      ka.zip(kb).iterator.map { case (x, y) => valueOrder(x, y) }
        .find(_ != 0).getOrElse(0) < 0
    }
    val pb = new PageBuilder(0x0a, pageSize, 0)
    keyed.foreach { case (key, _) =>
      val payload = record(key)
      val cell = varint(payload.length) ++ payload
      require(pb.fits(cell),
        s"index ${idx.name}: exceeds one page (${keyed.size} keys) — " +
          "the minimal writer keeps metadata autoindexes single-leaf")
      pb.add(cell)
    }
    pages += pb.render()
    pages.length + 1
  }

  // ---- whole-file writer

  /** Write `tables` (with their rows) as a complete SQLite database.
    * `rows(i)` pairs each table with its data in rowid order. Returns the
    * file bytes; use [[writeFile]] to put them on disk. */
  def build(
      tables: Seq[(TableDef, Seq[(Long, Seq[V])])],
      pageSize: Int = 4096,
      applicationId: Int = 0,
      userVersion: Int = 0): Array[Byte] = {
    require(pageSize >= 512 && pageSize <= 65536 &&
      Integer.bitCount(pageSize) == 1, s"bad page size $pageSize")
    val pages = new ArrayBuffer[Array[Byte]]() // page numbers 2..
    // master rows: (type, name, tbl_name, rootpage, sql)
    val master = new ArrayBuffer[Seq[V]]()
    tables.foreach { case (t, data) =>
      val tree = new TableTree(pages, pageSize, t.name)
      data.foreach { case (rowid, vals) =>
        val stored = if (t.rowidAlias >= 0) vals.updated(t.rowidAlias, VNull) else vals
        tree.add(rowid, stored)
      }
      val root = tree.finish()
      master += Seq(VText("table"), VText(t.name), VText(t.name),
        VInt(root), VText(t.sql))
      t.indexes.foreach { idx =>
        val iroot = indexTree(pages, pageSize, idx, data)
        master += Seq(VText("index"), VText(idx.name), VText(t.name),
          VInt(iroot), if (idx.auto) VNull else VText(idx.sql))
      }
    }
    // sqlite_master b-tree, root pinned to page 1 (content offset 100)
    val masterCells = master.zipWithIndex.map { case (vals, i) =>
      val payload = record(vals)
      require(payload.length <= pageSize - 35 - 100,
        s"sqlite_master row ${payload.length} B too large — raise pageSize")
      varint(payload.length) ++ varint(i + 1L) ++ payload
    }
    val rootPb = new PageBuilder(0x0d, pageSize, 100)
    val fitsPage1 = masterCells.forall { c =>
      val ok = rootPb.fits(c); if (ok) rootPb.add(c); ok
    }
    val page1 =
      if (fitsPage1) rootPb.render()
      else {
        // many schema objects: master leaves at the tail, page 1 interior
        var leaf = new PageBuilder(0x0d, pageSize, 0)
        val leaves = new ArrayBuffer[(Int, Long)]()
        masterCells.zipWithIndex.foreach { case (c, i) =>
          if (!leaf.fits(c)) {
            pages += leaf.render(); leaves += ((pages.length + 1, i.toLong))
            leaf = new PageBuilder(0x0d, pageSize, 0)
          }
          leaf.add(c)
        }
        pages += leaf.render(); leaves += ((pages.length + 1, masterCells.length.toLong))
        val pb = new PageBuilder(0x05, pageSize, 100)
        require(leaves.length <= (pageSize - 112) / 15,
          "sqlite_master needs a third b-tree level — raise pageSize")
        leaves.init.foreach { case (child, maxRowid) =>
          pb.add(java.nio.ByteBuffer.allocate(4).putInt(child).array() ++
            varint(maxRowid))
        }
        pb.render(rightChild = leaves.last._1)
      }
    val nPages = pages.length + 1
    val out = java.nio.ByteBuffer.allocate(nPages * pageSize)
    // 100-byte database header
    out.put("SQLite format 3".getBytes("ASCII")).put(0.toByte)
    out.putShort(if (pageSize == 65536) 1 else pageSize.toShort)
    out.put(1.toByte).put(1.toByte) // file format write/read version (legacy)
    out.put(0.toByte) // reserved space
    out.put(64.toByte).put(32.toByte).put(32.toByte) // payload fractions
    out.putInt(1) // change counter
    out.putInt(nPages)
    out.putInt(0).putInt(0) // freelist trunk, freelist count
    out.putInt(master.length) // schema cookie
    out.putInt(4) // schema format (supports serial types 8/9)
    out.putInt(0) // default page cache
    out.putInt(0) // largest root page (non-vacuum)
    out.putInt(1) // text encoding UTF-8
    out.putInt(userVersion)
    out.putInt(0) // incremental vacuum off
    out.putInt(applicationId)
    out.put(new Array[Byte](20)) // reserved
    out.putInt(1) // version-valid-for
    out.putInt(3040001) // sqlite version number (format-compatible marker)
    out.put(page1, 100, pageSize - 100)
    pages.foreach(out.put)
    out.array()
  }

  def writeFile(path: String, bytes: Array[Byte]): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)

  // ---- reader (full scans of the subset the writer emits — and any
  // rowid table without overflow pages)

  final case class Db(bytes: Array[Byte], pageSize: Int) {
    private def pageAt(n: Int): java.nio.ByteBuffer = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      bb.position((n - 1) * pageSize)
      bb.slice().order(java.nio.ByteOrder.BIG_ENDIAN)
    }

    private def readVarint(bb: java.nio.ByteBuffer): Long = {
      var v = 0L; var i = 0
      while (i < 8) {
        val b = bb.get()
        v = (v << 7) | (b & 0x7f)
        if ((b & 0x80) == 0) return v
        i += 1
      }
      (v << 8) | (bb.get() & 0xff)
    }

    private def readRecord(bb: java.nio.ByteBuffer): Seq[V] = {
      val start = bb.position()
      val headerLen = readVarint(bb)
      val types = new ArrayBuffer[Long]()
      while (bb.position() < start + headerLen) types += readVarint(bb)
      types.map {
        case 0 => VNull
        case 8 => VInt(0)
        case 9 => VInt(1)
        case 7 => VReal(java.lang.Double.longBitsToDouble(bb.getLong()))
        case t if t >= 1 && t <= 6 =>
          val n = Seq(1, 2, 3, 4, 6, 8)(t.toInt - 1)
          var v = 0L
          (0 until n).foreach(_ => v = (v << 8) | (bb.get() & 0xff))
          val shift = 64 - 8 * n
          VInt((v << shift) >> shift)
        case t if t >= 13 && (t % 2) == 1 =>
          val n = ((t - 13) / 2).toInt
          val arr = new Array[Byte](n); bb.get(arr); VText(new String(arr, "UTF-8"))
        case t if t >= 12 =>
          val n = ((t - 12) / 2).toInt
          val arr = new Array[Byte](n); bb.get(arr); VBlob(arr)
      }.toSeq
    }

    /** Full scan of a rowid-table b-tree in rowid order. */
    def scan(rootPage: Int): Seq[(Long, Seq[V])] = {
      val out = new ArrayBuffer[(Long, Seq[V])]()
      def walk(pageNo: Int): Unit = {
        val bb = pageAt(pageNo)
        val headerOffset = if (pageNo == 1) 100 else 0
        bb.position(headerOffset)
        val pageType = bb.get() & 0xff
        bb.getShort() // freeblock
        val nCells = bb.getShort() & 0xffff
        bb.getShort() // content start
        bb.get() // fragmented
        val rightChild = if (pageType == 0x05) bb.getInt() else 0
        val ptrBase = bb.position()
        val ptrs = (0 until nCells).map { i =>
          bb.position(ptrBase + 2 * i); bb.getShort() & 0xffff
        }
        pageType match {
          case 0x0d => ptrs.foreach { p =>
            bb.position(p)
            val payloadLen = readVarint(bb)
            val rowid = readVarint(bb)
            require(payloadLen <= pageSize - 35, "overflow pages unsupported")
            out += ((rowid, readRecord(bb)))
          }
          case 0x05 =>
            ptrs.foreach { p => bb.position(p); walk(bb.getInt()) }
            walk(rightChild)
          case other => throw new IllegalArgumentException(
            s"page $pageNo: unsupported page type 0x${other.toHexString}")
        }
      }
      walk(rootPage)
      out.toSeq
    }

    /** sqlite_master rows: (type, name, tbl_name, rootpage, sql). */
    def master: Seq[(String, String, String, Int, Option[String])] =
      scan(1).map { case (_, vals) =>
        val t = vals.map { case VText(s) => s; case VInt(i) => i.toString; case _ => null }
        (t(0), t(1), t(2),
          vals(3) match { case VInt(i) => i.toInt; case _ => 0 },
          vals(4) match { case VText(s) => Some(s); case _ => None })
      }

    def tableRoot(name: String): Int =
      master.collectFirst { case ("table", `name`, _, root, _) => root }
        .getOrElse(throw new NoSuchElementException(s"no table $name"))
  }

  def open(bytes: Array[Byte]): Db = {
    require(bytes.length >= 512 &&
      new String(bytes, 0, 15, "ASCII") == "SQLite format 3", "not SQLite")
    val raw = ((bytes(16) & 0xff) << 8) | (bytes(17) & 0xff)
    Db(bytes, if (raw == 1) 65536 else raw)
  }

  def openFile(path: String): Db =
    open(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
}
