package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** WARC (Web ARChive, ISO 28500) reader — the ingest format of web
  * crawls (Common Crawl ships ~1 GB `.warc.gz` shards). Reference
  * semantics: the WARC/1.0 record grammar — a `WARC/1.0` version line,
  * `Name: value` headers up to an empty line, exactly `Content-Length`
  * payload bytes, then the two-CRLF record separator. `response`
  * records carry an HTTP/1.x message as payload (status line, headers,
  * body); the rest (`warcinfo`, `request`, `metadata`) are passed
  * through with an empty HTTP head.
  *
  * Scale design: one crawl shard per task. A `.warc.gz` member stream
  * is not block-splittable, so the production layout is many ~1 GB
  *  files — `binaryFile` scan → `mapPartitions` parse keeps one codec
  * context per task, no shuffle anywhere, and 1000 executors ingest
  * 1000 shards concurrently. Gzip shards with MULTIPLE members
  * (per-record gzip, the Common Crawl convention) decode through the
  * JDK inflater's concatenated-member support.
  */
object Warc {

  /** One parsed WARC record. `http_status` is -1 for non-HTTP records
    * (warcinfo/request/metadata) and unparseable heads. */
  final case class WarcRow(
      file: String,
      seq: Int,               // record index within its file
      warc_type: String,
      target_uri: String,
      warc_date: String,
      record_id: String,
      content_type: String,   // WARC-level Content-Type header
      content_length: Long,   // WARC payload length in bytes
      http_status: Int,
      http_content_type: String,
      body: Array[Byte])      // HTTP body (response) or raw payload

  private val GzipMagic = 0x8b1f

  /** Parse every record of one WARC file (plain or gzip, multi-member
    * gzip included). */
  def parseFile(name: String, bytes: Array[Byte]): Seq[WarcRow] = {
    val raw =
      if (bytes.length >= 2 &&
        ((bytes(0) & 0xff) | ((bytes(1) & 0xff) << 8)) == GzipMagic)
        gunzipAll(bytes)
      else bytes
    parseRecords(name, raw)
  }

  /** Inflate a (possibly multi-member) gzip stream fully. */
  def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes), 64 * 1024)
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  // ---- record-level parse ------------------------------------------------

  private def parseRecords(name: String, raw: Array[Byte]): Seq[WarcRow] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRow]
    var pos = 0
    var seq = 0
    while (pos < raw.length) {
      pos = skipCrlf(raw, pos)
      if (pos < raw.length) {
        val headEnd = findBlankLine(raw, pos)
        require(headEnd > pos, s"$name: unterminated WARC header at $pos")
        val head = new String(raw, pos, headEnd - pos, "UTF-8")
        val lines = head.split("\r\n").toSeq
        require(lines.head.startsWith("WARC/"),
          s"$name: record $seq does not start with a WARC version line")
        val hdrs = headerMap(lines.tail)
        val len = hdrs.getOrElse("content-length", "0").trim.toLong
        val bodyStart = headEnd + 4 // skip CRLF CRLF
        require(bodyStart + len <= raw.length,
          s"$name: record $seq payload runs past end of file")
        val payload = java.util.Arrays.copyOfRange(
          raw, bodyStart, bodyStart + len.toInt)
        val wtype = hdrs.getOrElse("warc-type", "")
        val (status, httpCt, body) =
          if (wtype == "response" && looksHttp(payload)) parseHttp(payload)
          else (-1, "", payload)
        out += WarcRow(
          file = name,
          seq = seq,
          warc_type = wtype,
          target_uri = stripAngles(hdrs.getOrElse("warc-target-uri", "")),
          warc_date = hdrs.getOrElse("warc-date", ""),
          record_id = stripAngles(hdrs.getOrElse("warc-record-id", "")),
          content_type = hdrs.getOrElse("content-type", ""),
          content_length = len,
          http_status = status,
          http_content_type = httpCt,
          body = body)
        seq += 1
        pos = bodyStart + len.toInt
      }
    }
    out.toSeq
  }

  private def skipCrlf(raw: Array[Byte], start: Int): Int = {
    var p = start
    while (p < raw.length && (raw(p) == '\r' || raw(p) == '\n')) p += 1
    p
  }

  /** Index of the CRLFCRLF terminating the header block (index of the
    * first CR), or -1. */
  private def findBlankLine(raw: Array[Byte], start: Int): Int = {
    var p = start
    while (p + 3 < raw.length) {
      if (raw(p) == '\r' && raw(p + 1) == '\n' &&
        raw(p + 2) == '\r' && raw(p + 3) == '\n') return p
      p += 1
    }
    -1
  }

  private def headerMap(lines: Seq[String]): Map[String, String] =
    lines.iterator.flatMap { l =>
      val i = l.indexOf(':')
      if (i < 0) None else Some(l.take(i).trim.toLowerCase -> l.drop(i + 1).trim)
    }.toMap

  private def stripAngles(s: String): String =
    if (s.startsWith("<") && s.endsWith(">")) s.substring(1, s.length - 1) else s

  private def looksHttp(payload: Array[Byte]): Boolean =
    payload.length >= 5 && payload(0) == 'H' && payload(1) == 'T' &&
      payload(2) == 'T' && payload(3) == 'P' && payload(4) == '/'

  /** Split an HTTP/1.x response payload into (status, content-type,
    * body). Malformed heads degrade to (-1, "", whole payload). */
  private def parseHttp(payload: Array[Byte]): (Int, String, Array[Byte]) = {
    val headEnd = findBlankLine(payload, 0)
    if (headEnd < 0) return (-1, "", payload)
    val head = new String(payload, 0, headEnd, "UTF-8")
    val lines = head.split("\r\n").toSeq
    val status = lines.head.split(" ", 3) match {
      case Array(_, code, _*) if code.forall(_.isDigit) => code.toInt
      case _                                            => -1
    }
    val hdrs = headerMap(lines.tail)
    val body = java.util.Arrays.copyOfRange(payload, headEnd + 4, payload.length)
    (status, hdrs.getOrElse("content-type", ""), body)
  }

  // ---- Spark surface -----------------------------------------------------

  /** Scan a directory of `*.warc` / `*.warc.gz` shards into a Dataset —
    * one task per shard, parse inside `mapPartitions`, zero shuffles. */
  def read(spark: SparkSession, dir: String,
      glob: String = "*.warc*"): Dataset[WarcRow] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select("path", "content").as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        parseFile(name, bytes)
      })
  }

  /** Structured Streaming mirror of [[read]]: watch `dir` and parse
    * each NEW crawl shard as it lands — continuous-ingest topology for
    * a live crawl, one incremental unit per shard file with the file
    * source's exactly-once log (same contract as the tar-shard
    * streamer, [[graft.sinks.TarShards.streamShards]]). */
  def readStream(spark: SparkSession, dir: String,
      glob: String = "*.warc*"): Dataset[WarcRow] = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq( // binaryFile's fixed schema
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    spark.readStream.format("binaryFile").schema(schema)
      .option("pathGlobFilter", glob)
      .load(dir)
      .select("path", "content").as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        parseFile(name, bytes)
      })
  }

  /** The common downstream projection: successful HTML responses with
    * the body decoded as UTF-8 text (lossy on invalid sequences — the
    * crawl convention). */
  def htmlResponses(records: Dataset[WarcRow]): DataFrame = {
    import records.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    records
      .filter(r => r.http_status == 200 &&
        r.http_content_type.toLowerCase.startsWith("text/html"))
      .map(r => (r.file, r.seq, r.target_uri, r.warc_date,
        new String(r.body, java.nio.charset.StandardCharsets.UTF_8)))
      .toDF("file", "seq", "url", "fetched_at", "html")
      .withColumn("n_bytes", length(col("html")))
  }
}
