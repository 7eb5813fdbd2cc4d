package graft.sinks

import java.io.{BufferedOutputStream, FileOutputStream, OutputStream}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style sharded tar export/import for training corpora.
  *
  * The de-facto large-scale training-data layout (WebDataset: Aizman et
  * al. 2019; used by OpenCLIP/LAION pipelines) stores a corpus as a fleet
  * of POSIX tar shards where each sample is a group of adjacent entries
  * sharing a basename key (`00001234.txt`, `00001234.json`,
  * `00001234.jpg`, …). Sequential tar reads give streaming-friendly I/O
  * on object stores, and the shard is the unit of parallelism for both
  * writing and training.
  *
  * Scale design (100 TB):
  *  - `writeShards` groups by the caller-assigned shard id — ONE shuffle,
  *    keyed by shard — and each shard is exactly one task that STREAMS
  *    its sorted samples through a `FileOutputStream`: task memory is
  *    O(largest single entry), never O(shard). The caller sizes
  *    `shard = f(key)` so shards land at the usual 100 MB–1 GB; at
  *    100 TB that is ~10⁵ shards = ~10⁵ tasks, far above any cluster's
  *    slot count, so the write saturates all executors.
  *  - Entries within a shard are written in sorted key order
  *    (`flatMapSortedGroups` — sorting happens inside Spark's shuffle
  *    machinery, spillable, not in user memory), making shard bytes a
  *    pure function of the data: re-runs are byte-identical (headers pin
  *    mtime=0, uid/gid=0, mode 644), so shard-level checksums can detect
  *    any corpus drift.
  *  - `readShards` is the ingest mirror: one task per shard file via
  *    `binaryFile` (tar has no split points without an index, and shards
  *    are bounded by construction), yielding one row per entry.
  *
  * The tar container is hand-encoded from the POSIX.1-1988 ustar spec
  * (pax.h header layout) — same dependency-free approach as the
  * [[Sqlite]]/[[NetcdfWriter]] sinks.
  */
object TarShards {

  private val Block = 512

  /** One sample file inside a shard: entry name and payload. */
  final case class TarEntry(name: String, bytes: Array[Byte])

  /** Serialize one ustar header + payload + zero padding to `out`.
    * Deterministic: mtime 0, uid/gid 0, mode 0644, no user/group names. */
  private[sinks] def writeEntry(out: OutputStream, e: TarEntry): Long = {
    require(e.name.nonEmpty && e.name.length <= 100,
      s"tar entry name must be 1..100 chars, got '${e.name}'")
    // Array[Byte] already caps one entry below 2 GiB, matching the
    // single-array reader — no wider limit is honest to advertise (the
    // ustar octal field itself would allow 8 GiB).
    val h = new Array[Byte](Block)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII")
      System.arraycopy(b, 0, h, off, b.length)
    }
    def oct(off: Int, width: Int, v: Long): Unit =
      // POSIX numeric field: (width-1) octal digits then NUL
      put(off, ("%0" + (width - 1) + "o").format(v))
    put(0, e.name)                    // name[100]
    oct(100, 8, 420)                  // mode 0644
    oct(108, 8, 0)                    // uid
    oct(116, 8, 0)                    // gid
    oct(124, 12, e.bytes.length.toLong) // size
    oct(136, 12, 0)                   // mtime (epoch — deterministic)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum = spaces while summing
    h(156) = '0'                      // typeflag: regular file
    put(257, "ustar")                 // magic (NUL-terminated by zero fill)
    put(263, "00")                    // version
    var sum = 0L
    var i = 0
    while (i < Block) { sum += h(i) & 0xff; i += 1 }
    put(148, "%06o".format(sum))      // chksum: 6 octal digits NUL space
    h(154) = 0; h(155) = ' '
    out.write(h)
    out.write(e.bytes)
    val pad = (Block - e.bytes.length % Block) % Block
    if (pad > 0) out.write(new Array[Byte](pad))
    (Block + e.bytes.length + pad).toLong
  }

  /** Close a tar stream: two zero blocks (end-of-archive marker). */
  private[sinks] def writeTrailer(out: OutputStream): Long = {
    out.write(new Array[Byte](2 * Block)); 2L * Block
  }

  /** In-memory archive of `entries` in given order (tests, small shards). */
  def tarBytes(entries: Iterator[TarEntry]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    entries.foreach(writeEntry(bos, _))
    writeTrailer(bos)
    bos.toByteArray
  }

  /** LAZY tar walk: one entry materialized at a time, so a task's live
    * set is the source byte array plus ONE entry copy — with eager
    * parsing, 32 concurrent shard tasks each holding every entry copy
    * OOM'd an 8 GB heap at B21 scale. Validates each header checksum
    * and the octal size field; fails loudly on truncation or corruption
    * rather than yielding partial samples. */
  def parseTarIterator(bytes: Array[Byte]): Iterator[TarEntry] =
    new Iterator[TarEntry] {
      private var pos = 0
      private var done = false
      private def atEnd(): Boolean = {
        if (!done) {
          require(pos + Block <= bytes.length, s"tar truncated at offset $pos")
          if (bytes(pos) == 0) done = true // zero block ends the archive
        }
        done
      }
      def hasNext: Boolean = !atEnd()
      def next(): TarEntry = {
        if (atEnd()) throw new NoSuchElementException("tar exhausted")
        var sum = 0L
        var i = 0
        while (i < Block) {
          val b = bytes(pos + i) & 0xff
          sum += (if (i >= 148 && i < 156) ' '.toInt else b)
          i += 1
        }
        val stored = java.lang.Long.parseLong(
          new String(bytes, pos + 148, 8, "US-ASCII")
            .takeWhile(c => c >= '0' && c <= '7'), 8)
        require(stored == sum,
          s"tar header checksum mismatch at offset $pos: $stored != $sum")
        val nameLen = (0 until 100).indexWhere(i => bytes(pos + i) == 0) match {
          case -1 => 100
          case n => n
        }
        val name = new String(bytes, pos, nameLen, "US-ASCII")
        val sizeL = java.lang.Long.parseLong(
          new String(bytes, pos + 124, 12, "US-ASCII")
            .takeWhile(c => c >= '0' && c <= '7'), 8)
        // foreign archives may carry entries a single Array[Byte] (and
        // this single-array reader) cannot hold — fail with the reason,
        // not an Int-overflowed negative size
        require(sizeL <= Int.MaxValue - Block,
          s"tar entry '$name' is $sizeL bytes — too large to read into " +
            "one array; re-shard the source below 2 GiB per entry")
        val size = sizeL.toInt
        require(pos.toLong + Block + size <= bytes.length,
          s"tar entry '$name' ($size bytes) overruns archive at $pos")
        val e = TarEntry(name,
          java.util.Arrays.copyOfRange(bytes, pos + Block, pos + Block + size))
        pos += Block + size + (Block - size % Block) % Block
        e
      }
    }

  /** Eager convenience wrapper over [[parseTarIterator]] (tests, small
    * archives). */
  def parseTar(bytes: Array[Byte]): Seq[TarEntry] =
    parseTarIterator(bytes).toSeq

  /** Write `staged` — columns `(shard INT, key STRING,
    * files MAP<STRING,BINARY>)` — as `dir/shard-NNNNN.tar`, each sample's
    * files emitted adjacently as `key.ext` in map-key order, samples in
    * key order. One task per shard; entries stream to disk. Returns the
    * manifest (shard, n_samples, n_bytes) — an action (the write runs
    * eagerly, like the other file sinks). */
  def writeShards(spark: SparkSession, staged: DataFrame, dir: String): DataFrame = {
    import spark.implicits._
    val manifest = staged
      .select(col("shard").cast("int"), col("key"),
        map_entries(col("files")).as("files"))
      .as[(Int, String, Seq[(String, Array[Byte])])]
      .groupByKey(_._1)
      .flatMapSortedGroups($"key") { (shard, rows) =>
        val path = f"$dir/shard-$shard%05d.tar"
        val out = new BufferedOutputStream(new FileOutputStream(path), 1 << 16)
        var n = 0L
        var bytes = 0L
        try {
          rows.foreach { case (_, key, files) =>
            files.sortBy(_._1).foreach { case (ext, payload) =>
              bytes += writeEntry(out, TarEntry(s"$key.$ext", payload))
            }
            n += 1
          }
          bytes += writeTrailer(out)
        } finally out.close()
        Iterator((shard, n, bytes))
      }
      .toDF("shard", "n_samples", "n_bytes")
    manifest.cache().count() // materialize: every shard file is on disk
    manifest
  }

  private def parseShardFile(
      path: String, bytes: Array[Byte]): Iterator[(Int, String, String, Array[Byte])] = {
    val shard = path.substring(path.lastIndexOf("shard-") + 6,
      path.lastIndexOf(".tar")).toInt
    parseTarIterator(bytes).map { e =>
      val dot = e.name.lastIndexOf('.')
      (shard, e.name.substring(0, dot), e.name.substring(dot + 1), e.bytes)
    }
  }

  /** Read a shard directory back: one row per tar entry with the shard
    * id (from the file name), sample `key`, entry `ext`, and payload.
    * One task per shard file (tar is not block-splittable without an
    * external index; shards are bounded by construction). */
  def readShards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "shard-*.tar").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, b) => parseShardFile(p, b) }
      .toDF("shard", "key", "ext", "content")
  }

  /** Group a shard's entry stream into SAMPLES — the actual WebDataset
    * reading model: consecutive entries sharing a basename key form one
    * sample (writeShards emits them adjacently). Streaming-friendly: no
    * aggregation operator needed to reassemble a sample. */
  private def parseSampleFile(
      path: String, bytes: Array[Byte]): Iterator[(Int, String, Map[String, Array[Byte]])] =
    new Iterator[(Int, String, Map[String, Array[Byte]])] {
      // LAZY adjacent grouping over the lazy entry walk (entries within
      // a sample are contiguous by construction; order within the file
      // is the sort order) — live set is one sample's files, never the
      // whole shard
      private val entries = parseShardFile(path, bytes).buffered
      def hasNext: Boolean = entries.hasNext
      def next(): (Int, String, Map[String, Array[Byte]]) = {
        val (shard, key, _, _) = entries.head
        val files = Map.newBuilder[String, Array[Byte]]
        while (entries.hasNext && entries.head._2 == key) {
          val e = entries.next()
          files += e._3 -> e._4
        }
        (shard, key, files.result())
      }
    }

  /** Sample-level batch read: (shard, key, files MAP<ext,bytes>) — one
    * row per sample, the inverse of [[writeShards]]' staging schema. */
  def readSamples(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "shard-*.tar").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, b) => parseSampleFile(p, b) }
      .toDF("shard", "key", "files")
  }

  /** Structured Streaming mirror of [[readShards]]: watch `dir` and
    * parse each NEW shard file as it lands — the live-ingest topology
    * where training consumers follow the packaging job. Incremental
    * unit = one shard file = one task; the file-source log guarantees
    * exactly-once per shard. */
  def streamShards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq( // binaryFile's fixed schema
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    spark.readStream.format("binaryFile").schema(schema)
      .option("pathGlobFilter", "shard-*.tar").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, b) => parseShardFile(p, b) }
      .toDF("shard", "key", "ext", "content")
  }

  /** Streaming SAMPLE reader — [[readSamples]] over new shard files;
    * reassembly happens inside the parse (adjacent-entry grouping), so
    * downstream pipelines need no extra stateful operator. */
  def streamSamples(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    spark.readStream.format("binaryFile").schema(schema)
      .option("pathGlobFilter", "shard-*.tar").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, b) => parseSampleFile(p, b) }
      .toDF("shard", "key", "files")
  }
}
