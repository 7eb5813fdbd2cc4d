package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("hourlyWindows aggregates a micro-batched stream incrementally") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val events = mem.toDF()
      .toDF("event_id", "ts", "event_type", "value")
    val q = StreamingOps.hourlyWindows(events)
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("complete").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 10:05:00"), "click", 1.0),
        (2L, ts("2024-01-01 10:55:00"), "click", 2.0),
        (3L, ts("2024-01-01 11:05:00"), "view", 4.0))
      q.processAllAvailable()
      mem.addData((4L, ts("2024-01-01 10:59:00"), "click", 8.0))
      q.processAllAvailable()
      val out = spark.table("hourly_out").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      assert(out(("2024-01-01 10:00:00.0", "click")) == ((3L, 11.0)))
      assert(out(("2024-01-01 11:00:00.0", "view")) == ((1L, 4.0)))
    } finally q.stop()
  }

  test("attributionJoin: stream-stream interval join matches each click to in-horizon views") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Long, Timestamp)]
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    def df(m: MemoryStream[(Long, Long, Timestamp)]) =
      m.toDF().toDF("user_id", "event_id", "ts")
    val q = StreamingOps.attributionJoin(df(views), df(clicks),
      horizon = "1 hour", watermark = "2 hours")
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      views.addData(
        (1L, 10L, ts("2024-01-01 10:00:00")),
        (1L, 11L, ts("2024-01-01 10:40:00")),
        (2L, 12L, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      clicks.addData(
        (1L, 20L, ts("2024-01-01 10:59:00")), // in horizon of views 10+11
        (2L, 21L, ts("2024-01-01 11:30:00")), // 90 min after view 12: out
        (3L, 22L, ts("2024-01-01 10:30:00"))) // no view for user 3
      q.processAllAvailable()
      val out = spark.table("attr_out").collect()
        .map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
      assert(out == Map(
        (10L, 20L) -> 3540000000L, // 59 min in us
        (11L, 20L) -> 1140000000L)) // 19 min in us
      // exactly the batch join of the same rows: clicks before views
      // (cross-stream arrival order) must not change the match set
      clicks.addData((1L, 23L, ts("2024-01-01 11:10:00")))
      q.processAllAvailable()
      assert(spark.table("attr_out").count() == 3) // view 11 only (30 min)
    } finally q.stop()
  }

  test("hourlyNcSink writes one final .nc per watermark-closed hour") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.model.RegularGrid
    import graft.sources.NetcdfClassic
    val grid = RegularGrid(3, 1, 0.0, 0.0, 1.0, 1.0)
    val dir = java.nio.file.Files.createTempDirectory("ncstream").toString
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val events = mem.toDF().toDF("cell_id", "ts", "event_type", "value")
    val q = StreamingOps.hourlyNcSink(
      StreamingOps.hourlyCellWindows(events), grid, dir)
      .start()
    try {
      mem.addData(
        (0L, ts("2024-01-01 10:05:00"), "CO2", 1.0),
        (2L, ts("2024-01-01 10:55:00"), "CO2", 2.0),
        (0L, ts("2024-01-01 10:30:00"), "CH4", 4.0))
      q.processAllAvailable()
      // watermark has not passed hour 10 yet -> nothing emitted (append)
      assert(!new java.io.File(dir).list().exists(_.endsWith(".nc")))
      // an event 3h later pushes the watermark past hour 10
      mem.addData((1L, ts("2024-01-01 14:00:00"), "CO2", 8.0))
      q.processAllAvailable()
      mem.addData((1L, ts("2024-01-01 18:00:00"), "CO2", 16.0))
      q.processAllAvailable()
      val files = new java.io.File(dir).list().filter(_.endsWith(".nc")).sorted
      assert(files.contains("20240101T100000Z.nc"))
      val b = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/20240101T100000Z.nc"))
      val f = NetcdfClassic.readHeader(b)
      assert(NetcdfClassic.readVarDoubles(b, f, "CO2").toSeq == Seq(1.0, 0.0, 2.0))
      assert(NetcdfClassic.readVarDoubles(b, f, "CH4").toSeq == Seq(4.0, 0.0, 0.0))
    } finally q.stop()
  }

  test("hourlyNcSink catch-up batch closes 26 hours distributed, byte-matching the assembler") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.model.RegularGrid
    val grid = RegularGrid(4, 1, 0.0, 0.0, 1.0, 1.0)
    val dir = java.nio.file.Files.createTempDirectory("nccatchup").toString
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val events = mem.toDF().toDF("cell_id", "ts", "event_type", "value")
    val q = StreamingOps.hourlyNcSink(
      StreamingOps.hourlyCellWindows(events), grid, dir)
      .start()
    try {
      // one stalled backlog: 26 consecutive hours of data arrive at once,
      // then a far-future event pushes the watermark past all of them --
      // a single micro-batch must close and write every hour
      val backlog = (0 until 26).flatMap { h =>
        val (d, hh) = if (h < 24) ("01", h) else ("02", h - 24)
        Seq((h.toLong % 4, ts(f"2024-01-$d $hh%02d:00:00"), "CO2", h + 1.0),
          ((h + 1).toLong % 4, ts(f"2024-01-$d $hh%02d:30:00"), "CH4", 2.0 * h))
      }
      mem.addData(backlog: _*)
      q.processAllAvailable()
      mem.addData((0L, ts("2024-01-05 12:00:00"), "CO2", 1.0))
      q.processAllAvailable()
      val files = new java.io.File(dir).list().filter(_.endsWith(".nc")).sorted
      assert(files.length >= 26, s"expected >=26 closed hours, got ${files.toSeq}")
      (0 until 26).foreach { h =>
        val (d, hh) = if (h < 24) ("01", h) else ("02", h - 24)
        val fname = f"202401${d}T$hh%02d0000Z.nc"
        assert(files.contains(fname), s"missing $fname")
        val got = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$dir/$fname"))
        val co2 = new Array[Double](4); co2(h % 4) = h + 1.0
        val ch4 = new Array[Double](4); ch4((h + 1) % 4) = 2.0 * h
        val expected = StreamingOps.hourlyNcFileBytes(4,
          Seq("CH4" -> ch4, "CO2" -> co2))
        assert(java.util.Arrays.equals(got, expected),
          s"$fname bytes diverge from the reference assembler")
      }
    } finally q.stop()
  }

  test("sessionizeStream closes sessions across micro-batches via state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long)]
    val events = mem.toDF().toDF("event_id", "ts", "user_id")
    val q = StreamingOps.sessionizeStream(events, gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), 7L),
        (2L, ts("2024-01-01 10:10:00"), 7L))
      q.processAllAvailable()
      assert(spark.table("sessions_out").count() == 0) // still open
      mem.addData((3L, ts("2024-01-01 12:00:00"), 7L)) // gap -> closes first
      q.processAllAvailable()
      val out = spark.table("sessions_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(out.toSeq == Seq((7L, 1L, 2L, 600000000L)))
    } finally q.stop()
  }

  test("applyHourlyFactors: stream-static broadcast join, no state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val events = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val factors = spark.createDataFrame(Seq(("click", 10, 3.0)))
      .toDF("event_type", "hour_of_day", "sf")
    val q = StreamingOps.applyHourlyFactors(events, factors)
      .writeStream.format("memory").queryName("scaled_out")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 10:05:00"), "click", 2.0),
        (2L, ts("2024-01-01 11:05:00"), "click", 2.0))
      q.processAllAvailable()
      val out = spark.table("scaled_out").collect()
        .map(r => r.getLong(0) -> r.getDouble(3)).toMap
      assert(out == Map(1L -> 6.0, 2L -> 2.0))
    } finally q.stop()
  }

  test("dedupStream keeps first-seen texts across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val docs = mem.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingOps.dedupStream(docs)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), "alpha"),
        (2L, ts("2024-01-01 10:01:00"), "beta"),
        (3L, ts("2024-01-01 10:02:00"), "alpha")) // dupe in-batch
      q.processAllAvailable()
      mem.addData(
        (4L, ts("2024-01-01 10:10:00"), "beta"), // dupe across batches
        (5L, ts("2024-01-01 10:11:00"), "gamma"))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L, 5L))
    } finally q.stop()
  }

  test("lshCandidateStream flags near-dup docs across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val q = StreamingOps.lshCandidateStream(docs, threshold = 0.5)
      .writeStream.format("memory").queryName("lsh_out")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, base),
        (2L, "completely different words about spark shuffles and joins here"))
      q.processAllAvailable()
      // batch 2: a near-identical copy of doc 1 (one word changed at the
      // end) must pair with the doc-1 signature held in bucket state
      mem.addData((3L, base.replace("today", "tomorrow")))
      q.processAllAvailable()
      val pairs = spark.table("lsh_out").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(pairs.keySet == Set((1L, 3L)))
      assert(pairs((1L, 3L)) >= 0.5)
    } finally q.stop()
  }

  test("heavyHitterStream: exact counts when capacity covers the vocabulary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = StreamingOps.heavyHitterStream(docs, shards = 4, capacity = 100,
        minCount = 2L).toDF()
      .writeStream.format("memory").queryName("hh_exact")
      .outputMode("update").start()
    try {
      mem.addData((1L, "a a b"), (2L, "a c c"))
      q.processAllAvailable()
      mem.addData((3L, "b c"))
      q.processAllAvailable()
      // latest update per token reflects running exact counts
      val out = spark.table("hh_exact").collect()
        .map(r => r.getString(1) -> r.getLong(2))
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(out == Map("a" -> 3L, "b" -> 2L, "c" -> 3L))
    } finally q.stop()
  }

  test("cardinalityStream: sketch state dedups keys across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val rows = mem.toDF().toDF("user_id")
    // one shard: the running estimate must count DISTINCT keys across
    // batches (repeats in batch 2 must not inflate it), and at this
    // size the HLL is in exact coupon mode, so estimates are exact
    val q = StreamingOps.cardinalityStream(rows, "user_id",
        shards = 1, lgK = 14).toDF()
      .writeStream.format("memory").queryName("card_stream")
      .outputMode("update").start()
    try {
      mem.addData(1L to 100L: _*)
      q.processAllAvailable()
      mem.addData(51L to 150L: _*) // 50 repeats + 50 new
      q.processAllAvailable()
      val rows = spark.table("card_stream").collect()
      val ests = rows.map(r => r.getLong(1)).sorted
      assert(ests.toSeq == Seq(100L, 150L))
      // interop: the emitted sketch bytes ARE DataSketches HLL state —
      // Spark's builtin hll_union_agg must union them with a sketch
      // built by the BATCH path (hll_sketch_agg) into one estimate
      val streamSketch = rows.maxBy(_.getLong(1)).getAs[Array[Byte]]("sketch")
      val batchSketch = spark.range(101L, 200L) // 100..199 overlaps 101..150
        .select(col("id").cast("string").as("k"))
        .agg(expr("hll_sketch_agg(k, 14)").as("sketch"))
        .collect()(0).getAs[Array[Byte]](0)
      import spark.implicits._
      val unioned = Seq(streamSketch, batchSketch).toDF("sketch")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sketch))"))
        .collect()(0).getLong(0)
      assert(unioned == 199L) // 1..150 ∪ 101..199, exact in coupon mode
    } finally q.stop()
  }

  test("frequencyStream: summed shard states equal the batch CMS bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val rows = mem.toDF().toDF("user_id")
    val q = StreamingOps.frequencyStream(rows, "user_id",
        shards = 4, depth = 4, width = 64).toDF()
      .writeStream.format("memory").queryName("freq_stream")
      .outputMode("update").start()
    try {
      mem.addData((1L to 100L) ++ (1L to 40L): _*)
      q.processAllAvailable()
      mem.addData(21L to 120L: _*) // arrival split must not matter
      q.processAllAvailable()
      // final state per shard = element-wise max over update emissions
      // (counters only grow); merged = cell-wise sum across shards
      val merged = spark.table("freq_stream")
        .select(col("shard"), posexplode(col("counters")).as(Seq("pos", "n")))
        .groupBy("shard", "pos").agg(max("n").as("n"))
        .groupBy("pos").agg(sum("n").as("n"))
        .where(col("n") > 0)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      // state is hard-bounded: depth·width cells per shard, regardless
      // of distinct keys seen
      assert(merged.keys.max < 4 * 64)
      val batch = graft.ops.FreqSketch.cmsBuild(
        spark.createDataset((1L to 100L) ++ (1L to 40L) ++ (21L to 120L))
          .toDF("user_id"), "user_id", depth = 4, width = 64)
        .collect().map(r => (r.getInt(0) * 64 + r.getLong(1).toInt) -> r.getLong(2))
        .toMap
      assert(merged == batch)
    } finally q.stop()
  }

  test("frequencyStream: null keys are dropped identically to the batch CMS") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val rows = mem.toDF().toDF("id", "user_id")
    val q = StreamingOps.frequencyStream(rows, "user_id",
        shards = 2, depth = 2, width = 32).toDF()
      .writeStream.format("memory").queryName("freq_nulls")
      .outputMode("update").start()
    try {
      mem.addData((1L, "a"), (2L, null), (3L, "a"), (4L, null), (5L, "b"))
      q.processAllAvailable()
      val merged = spark.table("freq_nulls")
        .select(col("shard"), posexplode(col("counters")).as(Seq("pos", "n")))
        .groupBy("shard", "pos").agg(max("n").as("n"))
        .groupBy("pos").agg(sum("n").as("n"))
        .where(col("n") > 0)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val batch = graft.ops.FreqSketch.cmsBuild(
        spark.createDataFrame(Seq(
          (1L, "a"), (2L, null), (3L, "a"), (4L, null), (5L, "b")))
          .toDF("id", "user_id"), "user_id", depth = 2, width = 32)
        .collect().map(r => (r.getInt(0) * 32 + r.getLong(1).toInt) -> r.getLong(2))
        .toMap
      // bit-for-bit: nulls contribute to neither side (no "0" key, no NPE)
      assert(merged == batch)
      assert(merged.values.sum == 2L * 3L) // depth × non-null rows
    } finally q.stop()
  }

  test("frequencyStream: state survives a kill/restart at a checkpoint (RocksDB)") {
    val in = java.nio.file.Files.createTempDirectory("freq_ckpt_in")
    val ck = java.nio.file.Files.createTempDirectory("freq_ckpt_st")
    def feed(lo: Long, hi: Long): Unit =
      spark.range(lo, hi).select((col("id") % 40L).as("user_id"))
        .coalesce(1).write.mode("append").parquet(in.toString)
    feed(0L, 100L)
    val schema = spark.read.parquet(in.toString).schema
    // foreachBatch, not the memory sink: memory refuses checkpoint
    // recovery ("This query does not support recovering from
    // checkpoint location"); foreachBatch is the recoverable sink.
    val emitted =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Long])]
    def phase(): Unit = {
      val st = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(in.toString)
      val q = StreamingOps.frequencyStream(st, "user_id",
          shards = 4, depth = 2, width = 32)
        .writeStream
        .foreachBatch {
          (ds: org.apache.spark.sql.Dataset[StreamingOps.ShardFreqState],
           _: Long) =>
            val rows = ds.collect().map(s => (s.shard, s.counters))
            emitted.synchronized { emitted ++= rows }
            ()
        }
        .option("checkpointLocation", ck.toString)
        .outputMode("update").start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      phase() // killed after the first file
      feed(100L, 250L)
      emitted.clear() // post-restart emissions alone must carry full state
      phase() // restarted over the same checkpoint
      val merged = emitted.groupBy(_._1).values
        .map(_.map(_._2).reduce((a, b) =>
          a.zip(b).map { case (x, y) => math.max(x, y) }))
        .reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
        .zipWithIndex.collect { case (n, pos) if n > 0 => pos -> n }.toMap
      val batch = graft.ops.FreqSketch.cmsBuild(
        spark.read.parquet(in.toString), "user_id", depth = 2, width = 32)
        .collect()
        .map(r => (r.getInt(0) * 32 + r.getLong(1).toInt) -> r.getLong(2))
        .toMap
      assert(merged == batch)
    } finally {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    }
  }

  test("heavyHitterStream: capped state runs Misra-Gries decrements") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    // one shard so every token shares the capacity-2 map; sorted batch
    // order makes the decrement deterministic: a,a,a,b,b then c finds
    // the map full -> a:3->2, b:2->1, c dropped
    val q = StreamingOps.heavyHitterStream(docs, shards = 1, capacity = 2,
        minCount = 1L).toDF()
      .writeStream.format("memory").queryName("hh_capped")
      .outputMode("update").start()
    try {
      mem.addData((1L, "a a a b b c"))
      q.processAllAvailable()
      val out = spark.table("hh_capped").collect()
        .map(r => r.getString(1) -> r.getLong(2)).toMap
      assert(out == Map("a" -> 2L, "b" -> 1L))
    } finally q.stop()
  }

  test("bm25IndexIngest streams docs into the persisted index; replayed " +
    "batches are idempotent; results equal a batch rebuild") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("bm25ing").toString
    val allDocs = spark.createDataFrame((0L until 30L).map(i =>
      (i, s"alpha w${i % 7} tok$i"))).toDF("doc_id", "text")
    graft.text.Bm25.writeIndex(spark,
      allDocs.where(col("doc_id") < 10), s"$dir/index", numFiles = 2)
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.bm25IndexIngest(
      mem.toDF().toDF("doc_id", "text"), s"$dir/index", s"$dir/ckpt")
    try {
      mem.addData((10L until 20L).map(i => (i, s"alpha w${i % 7} tok$i")): _*)
      q.processAllAvailable()
      // second batch OVERLAPS the first (docs 15..19 again) — the
      // foreachBatch replay shape; dedupAgainstIndex must make the
      // duplicates a no-op for postings AND stats
      mem.addData((15L until 30L).map(i => (i, s"alpha w${i % 7} tok$i")): _*)
      q.processAllAvailable()
    } finally q.stop()
    val queries = Seq((0, "alpha w3"), (1, "tok25 w4"))
    def res(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(res(graft.text.Bm25.searchPersisted(spark, s"$dir/index", queries))
      == res(graft.text.Bm25.search(spark, allDocs, queries)),
      "streamed index must serve exactly the batch-rebuild results")
  }

  test("bm25IndexIngest BOOTSTRAPS a fresh index dir: the first " +
    "micro-batch creates it, dedup stays on") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("bm25boot").toString
    val allDocs = spark.createDataFrame((0L until 12L).map(i =>
      (i, s"alpha w${i % 3} tok$i"))).toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.bm25IndexIngest(
      mem.toDF().toDF("doc_id", "text"), s"$dir/index", s"$dir/ckpt")
    try {
      mem.addData((0L until 8L).map(i => (i, s"alpha w${i % 3} tok$i")): _*)
      q.processAllAvailable()
      mem.addData((6L until 12L).map(i => (i, s"alpha w${i % 3} tok$i")): _*)
      q.processAllAvailable() // overlap 6..7 deduped against batch 0
    } finally q.stop()
    val queries = Seq((0, "alpha w2"), (1, "tok9"))
    def res(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(res(graft.text.Bm25.searchPersisted(spark, s"$dir/index", queries))
      == res(graft.text.Bm25.search(spark, allDocs, queries)),
      "bootstrapped streamed index must equal the batch rebuild")
  }

  test("annIndexIngest keeps a refine-enabled index's vecs relation in " +
    "lockstep: a streamed vector is exact-rerankable at cos 1.0") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("anningv").toString
    def vec(i: Long): Seq[Float] =
      (0 until 4).map(d => ((i % 7) * 3 + d + 1).toFloat)
    val base = spark.createDataFrame((0L until 30L).map(i => (i, vec(i))))
      .toDF("vec_id", "embedding")
    graft.similarity.Similarity.ivfPqWriteIndexTrained(base, s"$dir/index",
      numFiles = 2, m = 2, dims = 4, ksub = 4, nlists = 2, iters = 1,
      trainMod = 3, storeVecs = true)
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = StreamingOps.annIndexIngest(
      mem.toDF().toDF("vec_id", "embedding"), s"$dir/index", s"$dir/ckpt",
      m = 2, dims = 4)
    try {
      mem.addData((30L until 40L).map(i => (i, vec(i))): _*)
      q.processAllAvailable()
    } finally q.stop()
    // the streamed rows landed in BOTH lifecycle relations
    assert(graft.ops.Layout.clusteredTable(spark, s"$dir/index/vecs")
      .where(col("vec_id") >= 30L).count() == 10L,
      "streamed vectors missing from the refine relation")
    // and the refine path can exact-rerank a streamed candidate: query
    // with vec(37)'s vector — its streamed copy must surface at
    // cos_sim 1.0 through the persisted rerank (which reads raw
    // vectors ONLY from dir/vecs)
    val out = graft.similarity.Similarity.ivfPqRerankPersistedQ(spark,
      s"$dir/index",
      spark.createDataFrame(Seq((900L, vec(37L)))).toDF("query_id", "embedding"),
      k = 30, rerankR = 40, m = 2, dims = 4, centroidMod = 1, nprobe = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(3)))
    assert(out.exists { case (n, c) => n == 37L && c == 1.0 },
      s"streamed vec 37 not exact-reranked to cos 1.0: ${out.mkString(",")}")
  }

  test("annIndexIngest streams vectors into the persisted IVF+PQ index; " +
    "appended vectors are searchable; replays are idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("anning").toString
    def vec(i: Long): Seq[Float] =
      (0 until 4).map(d => ((i % 5) + d).toFloat)
    val base = spark.createDataFrame((0L until 30L).map(i => (i, vec(i))))
      .toDF("vec_id", "embedding")
    graft.similarity.Similarity.ivfPqWriteIndexTrained(base, s"$dir/index",
      numFiles = 2, m = 2, dims = 4, ksub = 4, nlists = 2, iters = 1,
      trainMod = 3)
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = StreamingOps.annIndexIngest(
      mem.toDF().toDF("vec_id", "embedding"), s"$dir/index", s"$dir/ckpt",
      m = 2, dims = 4)
    try {
      mem.addData((30L until 40L).map(i => (i, vec(i))): _*)
      q.processAllAvailable()
      mem.addData((35L until 45L).map(i => (i, vec(i))): _*) // replay 35..39
      q.processAllAvailable()
    } finally q.stop()
    // every id ingested exactly once despite the overlap
    val tail = spark.read.parquet(s"$dir/index/codes/tail")
    assert(tail.count() == 15L, s"tail holds ${tail.count()}, want 15")
    assert(tail.select("neighbor_id").distinct().count() == 15L)
    // and the streamed vectors are searchable: ids ≡ 0 (mod 5) all
    // share vec(40)'s exact vector (9 of them among ids 0..44), so at
    // k = 15 the tie-broken top-k must include the STREAMED copy 40
    val out = graft.similarity.Similarity.ivfPqSearchPersistedVecs(spark,
      s"$dir/index", Seq((0L, vec(40L).map(_.toDouble).toArray)), k = 15,
      m = 2, dims = 4, centroidMod = 1, nprobe = 2)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(out.contains(40L),
      s"streamed vector 40 not surfaced by the persisted search: $out")
  }
}
