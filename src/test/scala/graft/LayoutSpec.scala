package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

class LayoutSpec extends SparkSpec {

  /** Naive reference interleave: bit i of x → bit 2i, bit i of y → 2i+1. */
  private def naiveZ(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zorderKeyL matches the naive bit interleave") {
    val rnd = new scala.util.Random(7)
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), ((1L << 31) - 1, (1L << 31) - 1)) ++
      Seq.fill(500)((rnd.nextInt(Int.MaxValue).toLong, rnd.nextInt(Int.MaxValue).toLong))
    pts.foreach { case (x, y) =>
      assert(Layout.zorderKeyL(x, y) == naiveZ(x, y), s"($x,$y)")
    }
    // key monotone under quadrant refinement: z of a cell lies inside its
    // enclosing square's interval
    assert(Layout.zorderKeyL(2, 3) == 14L) // hand-computed: x=10b→0100, y=11b→1010 → 1110
  }

  test("zorderKey Column matches the driver-side twin through codegen") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(300)((rnd.nextInt(1 << 20).toLong, rnd.nextInt(1 << 20).toLong))
    val df = spark.createDataFrame(rows).toDF("ix", "iy")
      .select(col("ix"), col("iy"),
        Layout.zorderKey(col("ix"), col("iy")).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) == Layout.zorderKeyL(r.getLong(0), r.getLong(1)))
    }
  }

  private def coveredCells(ranges: Seq[(Long, Long)], bits: Int): Set[(Long, Long)] = {
    val n = 1L << bits
    (for {
      x <- 0L until n; y <- 0L until n
      z = Layout.zorderKeyL(x, y)
      if ranges.exists { case (lo, hi) => z >= lo && z <= hi }
    } yield (x, y)).toSet
  }

  test("zRangesForBox: uncapped cover is EXACT, ascending, disjoint") {
    val boxes = Seq((13L, 47L, 9L, 52L), (0L, 63L, 0L, 63L), (5L, 5L, 7L, 7L),
      (0L, 0L, 0L, 63L), (31L, 32L, 31L, 32L))
    for ((x0, x1, y0, y1) <- boxes) {
      val ranges = Layout.zRangesForBox(x0, x1, y0, y1, bits = 6,
        maxRanges = Int.MaxValue)
      // ascending + disjoint (merged, so strictly separated by a gap)
      ranges.sliding(2).foreach {
        case Seq(a, b) => assert(a._2 + 1 < b._1, s"$a $b not separated")
        case _ =>
      }
      val box = (for {x <- x0 to x1; y <- y0 to y1} yield (x, y)).toSet
      assert(coveredCells(ranges, 6) == box, s"box ($x0,$x1,$y0,$y1)")
    }
  }

  test("zRangesForBox: capped cover is a SUPERSET within the range budget") {
    val (x0, x1, y0, y1) = (13L, 47L, 9L, 52L)
    val uncapped = Layout.zRangesForBox(x0, x1, y0, y1, 6, Int.MaxValue)
    assert(uncapped.length > 12) // the cap path is actually exercised below
    val capped = Layout.zRangesForBox(x0, x1, y0, y1, 6, maxRanges = 12)
    assert(capped.length <= 12)
    val box = (for {x <- x0 to x1; y <- y0 to y1} yield (x, y)).toSet
    val cov = coveredCells(capped, 6)
    assert(box.subsetOf(cov), "capped cover lost box cells")
    // and it still prunes: the cover must be well under the full grid
    assert(cov.size < 64 * 64, "capped cover degenerated to the full grid")
  }

  test("zorderLayout: files own disjoint z intervals and the box read prunes") {
    val n = 64
    val grid = spark.range(n.toLong * n).select(
      (col("id") / n).cast("long").as("ix"), (col("id") % n).as("iy"),
      (col("id") * 3 % 97).as("v"))
    val laid = Layout.zorderLayout(grid, col("ix"), col("iy"), numFiles = 8)
    // partition intervals disjoint → parquet footer min/max is an index
    val parts = laid
      .select(spark_partition_id().as("p"), col("z_key"))
      .groupBy("p").agg(min("z_key").as("lo"), max("z_key").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    parts.sliding(2).foreach {
      case Array(a, b) => assert(a._2 < b._1, s"overlapping files $a $b")
      case _ =>
    }
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    laid.write.mode("overwrite").parquet(dir)
    val ranges = Layout.zRangesForBox(3, 9, 17, 23, bits = 6, maxRanges = 8)
    val back = spark.read.parquet(dir)
      .where(Layout.inZRanges(col("z_key"), ranges))
      .where(col("ix").between(3, 9) && col("iy").between(17, 23))
    assert(back.count() == 7L * 7L)
    // the z cover for this 7×7 box spans a small slice of z space: the
    // read-side predicate admits at most the covered interval volume
    val vol = ranges.map { case (lo, hi) => hi - lo + 1 }.sum
    assert(vol < (n.toLong * n) / 8, s"cover volume $vol does not prune")
  }

  test("zorder lifecycle: appends land raw, optimize re-clusters only the tail") {
    val n = 64
    def grid(lo: Long, hi: Long) = spark.range(lo, hi).select(
      (col("id") / n % n).cast("long").as("ix"), (col("id") % n).as("iy"),
      col("id").as("v"))
    val dir = java.nio.file.Files.createTempDirectory("zlife").toString
    Layout.zorderWrite(grid(0L, 3000L), col("ix"), col("iy"), 4, dir)
    Layout.zorderAppend(grid(3000L, 3500L), col("ix"), col("iy"), dir)
    Layout.zorderAppend(grid(3500L, 4096L), col("ix"), col("iy"), dir)
    // table complete and exact mid-lifecycle (tail unsorted)
    assert(Layout.zorderTable(spark, dir).count() == 4096L)
    val compacted = Layout.zorderOptimize(spark, dir, numFiles = 2)
    assert(compacted == 1096L)
    // r19 contract: the compacted tail files are RETIRED in the manifest
    // (invisible to readers) but survive on disk one maintenance
    // interval for in-flight readers; vacuum reclaims them now. The tail
    // DIRECTORY itself survives (never deleted — see zorderOptimize's
    // concurrency note) but then holds no data files.
    val retained = Option(new java.io.File(s"$dir/tail").listFiles())
      .getOrElse(Array[java.io.File]())
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(retained.nonEmpty, "retired tail files must survive until vacuum")
    assert(Layout.vacuum(spark, dir, force = true) == retained.length.toLong)
    val tailFiles = Option(new java.io.File(s"$dir/tail").listFiles())
      .getOrElse(Array[java.io.File]())
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(tailFiles.isEmpty, tailFiles.mkString(","))
    // no rows lost or duplicated across the whole lifecycle
    val table = Layout.zorderTable(spark, dir)
    assert(table.count() == 4096L)
    assert(table.select(countDistinct("v")).collect()(0).getLong(0) == 4096L)
    // optimize ≡ full re-layout on the touched (tail) rows: gen-1 holds
    // exactly the appended rows, sorted by z_key within each file with
    // files owning disjoint z intervals — the zorderLayout invariants
    val gen1 = spark.read.parquet(s"$dir/gen-1")
    assert(gen1.count() == 1096L)
    assert(gen1.select(min("v"), max("v")).collect()(0) match {
      case r => r.getLong(0) == 3000L && r.getLong(1) == 4095L
    })
    val relaid = Layout.zorderLayout(grid(3000L, 4096L),
      col("ix"), col("iy"), numFiles = 2)
    assert(gen1.select("ix", "iy", "v", "z_key").collect().toSet ==
      relaid.select("ix", "iy", "v", "z_key").collect().toSet)
    val fileRanges = gen1
      .select(input_file_name().as("f"), col("z_key"))
      .groupBy("f").agg(min("z_key").as("lo"), max("z_key").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    fileRanges.sliding(2).foreach {
      case Array(a, b) => assert(a._2 < b._1, s"gen-1 files overlap: $a $b")
      case _ =>
    }
    // box query equivalent at every stage, and pruning works post-compact
    val ranges = Layout.zRangesForBox(3, 9, 17, 23, bits = 6, maxRanges = 8)
    val got = table
      .where(Layout.inZRanges(col("z_key"), ranges))
      .where(col("ix").between(3, 9) && col("iy").between(17, 23))
      .count()
    val want = grid(0L, 4096L)
      .where(col("ix").between(3, 9) && col("iy").between(17, 23)).count()
    assert(got == want)
    // idempotence: optimize with no tail data is a no-op
    assert(Layout.zorderOptimize(spark, dir, 2) == 0L)
    // post-optimize appends land in the surviving tail dir; the next
    // pass compacts exactly them into gen-2
    Layout.zorderAppend(grid(4096L, 4296L), col("ix"), col("iy"), dir)
    assert(Layout.zorderOptimize(spark, dir, 2) == 200L)
    assert(spark.read.parquet(s"$dir/gen-2").count() == 200L)
    assert(Layout.zorderTable(spark, dir).count() == 4296L)
  }

  test("zorderOptimize works through an explicit file:-scheme Hadoop path") {
    // regression for the java.io.File tail discovery: a scheme-qualified
    // URI (the shape every HDFS/object-store path has) made the old
    // precheck see no tail and silently no-op
    val n = 64
    def grid(lo: Long, hi: Long) = spark.range(lo, hi).select(
      (col("id") / n % n).cast("long").as("ix"), (col("id") % n).as("iy"),
      col("id").as("v"))
    val local = java.nio.file.Files.createTempDirectory("zuri")
    val dir = local.toUri.toString.stripSuffix("/") // "file:///..."
    assert(dir.startsWith("file:/"), dir)
    Layout.zorderWrite(grid(0L, 1000L), col("ix"), col("iy"), 2, dir)
    Layout.zorderAppend(grid(1000L, 1300L), col("ix"), col("iy"), dir)
    assert(Layout.zorderOptimize(spark, dir, 2) == 300L)
    assert(spark.read.parquet(s"$dir/gen-1").count() == 300L)
    assert(Layout.zorderTable(spark, dir).count() == 1300L)
    // tail data files are gone after vacuum (purged through the same
    // scheme-qualified FileSystem)
    Layout.vacuum(spark, dir, force = true)
    val tailFiles = Option(new java.io.File(s"$local/tail").listFiles())
      .getOrElse(Array[java.io.File]())
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(tailFiles.isEmpty, tailFiles.mkString(","))
  }

  test("zorderConsolidate merges generations; result ≡ full re-layout") {
    val n = 64
    def grid(lo: Long, hi: Long) = spark.range(lo, hi).select(
      (col("id") / n % n).cast("long").as("ix"), (col("id") % n).as("iy"),
      col("id").as("v"))
    val dir = java.nio.file.Files.createTempDirectory("zcons").toString
    Layout.zorderWrite(grid(0L, 2000L), col("ix"), col("iy"), 2, dir)
    // consolidate below two generations is a no-op
    assert(Layout.zorderConsolidate(spark, dir, 2) == 0L)
    // build up gen-1..gen-3 through append/optimize cycles
    for (i <- 0 until 3) {
      Layout.zorderAppend(
        grid(2000L + i * 500L, 2500L + i * 500L), col("ix"), col("iy"), dir)
      assert(Layout.zorderOptimize(spark, dir, 2) == 500L)
    }
    def gens(): Seq[String] = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
      .map(_.getName).toSeq.sorted
    assert(gens() == Seq("gen-0", "gen-1", "gen-2", "gen-3"))
    assert(Layout.zorderConsolidate(spark, dir, 3) == 3500L)
    // the manifest retires gen-0..3 atomically; they stay on disk for
    // in-flight readers until vacuum, then one generation remains,
    // numbered past the old max
    assert(gens() == Seq("gen-0", "gen-1", "gen-2", "gen-3", "gen-4"))
    Layout.vacuum(spark, dir, force = true)
    assert(gens() == Seq("gen-4"))
    val merged = spark.read.parquet(s"$dir/gen-4")
    // consolidation ≡ full re-layout of the same rows: identical row
    // set, zorderLayout's disjoint-file-interval invariant restored
    val relaid = Layout.zorderLayout(grid(0L, 3500L), col("ix"), col("iy"), 3)
    assert(merged.select("ix", "iy", "v", "z_key").collect().toSet ==
      relaid.select("ix", "iy", "v", "z_key").collect().toSet)
    val fileRanges = merged
      .select(input_file_name().as("f"), col("z_key"))
      .groupBy("f").agg(min("z_key").as("lo"), max("z_key").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    fileRanges.sliding(2).foreach {
      case Array(a, b) => assert(a._2 < b._1, s"merged files overlap: $a $b")
      case _ =>
    }
    // zorderOptimize(maxGenerations=G): the pass that pushes the count
    // past G triggers consolidation automatically
    for (i <- 0 until 2) {
      Layout.zorderAppend(
        grid(3500L + i * 100L, 3600L + i * 100L), col("ix"), col("iy"), dir)
      assert(Layout.zorderOptimize(spark, dir, 2, maxGenerations = 2) == 100L)
    }
    // after cycle 1: gen-4 + gen-5 (2 ≤ G, no merge); after cycle 2 the
    // third generation trips the policy and all merge into one (the
    // retired inputs linger on disk until vacuum)
    Layout.vacuum(spark, dir, force = true)
    assert(gens().size == 1, gens().mkString(","))
    assert(Layout.zorderTable(spark, dir).count() == 3700L)
    assert(Layout.zorderTable(spark, dir)
      .select(countDistinct("v")).collect()(0).getLong(0) == 3700L)
  }

  test("tombstone deletes: masked at read immediately, dropped from the " +
    "compacted tail, purged physically at consolidate") {
    val n = 64
    def grid(lo: Long, hi: Long) = spark.range(lo, hi).select(
      (col("id") / n % n).cast("long").as("ix"), (col("id") % n).as("iy"),
      col("id").as("v"))
    val dir = java.nio.file.Files.createTempDirectory("zdel").toString
    def delFiles() = Option(new java.io.File(s"$dir/deletes").listFiles())
      .getOrElse(Array[java.io.File]())
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    Layout.zorderWrite(grid(0L, 2000L), col("ix"), col("iy"), 2, dir)
    Layout.zorderAppend(grid(2000L, 2500L), col("ix"), col("iy"), dir)
    // delete keys from BOTH a generation (10, 1999) and the tail (2100)
    Layout.zorderDelete(spark, dir, "v",
      spark.createDataFrame(Seq(Tuple1(10L), Tuple1(1999L), Tuple1(2100L)))
        .toDF("v"))
    // read-with-tombstones ≡ the same table rebuilt without the deleted
    // rows — the merge-on-read equivalence the whole design hangs on
    val want = grid(0L, 2500L)
      .where(!col("v").isin(10L, 1999L, 2100L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def table() = Layout.zorderTable(spark, dir).select("ix", "iy", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(table() == want)
    // optimize: the compacted generation physically lacks the deleted
    // tail row; tombstones are RETAINED (gen-0 still holds 10 and 1999)
    assert(Layout.zorderOptimize(spark, dir, 2) == 500L)
    assert(spark.read.parquet(s"$dir/gen-1").count() == 499L)
    assert(spark.read.parquet(s"$dir/gen-1")
      .where(col("v") === 2100L).count() == 0L)
    assert(delFiles().nonEmpty, "tombstones purged while gen-0 is dirty")
    assert(table() == want)
    // consolidate: the merged generation drops every tombstoned row and
    // the tombstone relation is emptied — reads no longer anti-join
    assert(Layout.zorderConsolidate(spark, dir, 2) == 2497L)
    val merged = spark.read.parquet(s"$dir/gen-2")
    assert(merged.count() == 2497L)
    assert(merged.where(col("v").isin(10L, 1999L, 2100L)).count() == 0L)
    assert(table() == want)
    // retired tombstones unblock re-insertion of a deleted key WITHOUT
    // a vacuum: pendingTombstoned resolves the LIVE tombstone set from
    // the manifest, and the retired files (still on disk for in-flight
    // readers) are invisible to it
    Layout.zorderAppend(grid(10L, 11L), col("ix"), col("iy"), dir)
    assert(Layout.zorderTable(spark, dir).where(col("v") === 10L).count() == 1L)
    assert(Layout.zorderOptimize(spark, dir, 2) == 1L)
    // pending tombstones trigger a physical rewrite even from a single
    // generation (the two-generation minimum is a no-merge shortcut,
    // not a delete-blocking rule)
    Layout.zorderConsolidate(spark, dir, 2) // fold gen-2 + gen-3 first
    Layout.zorderDelete(spark, dir, "v",
      spark.createDataFrame(Seq(Tuple1(42L))).toDF("v"))
    assert(Layout.zorderConsolidate(spark, dir, 2) == 2497L)
    Layout.vacuum(spark, dir, force = true)
    assert(delFiles().isEmpty)
    assert(Layout.zorderTable(spark, dir).where(col("v") === 42L).count() == 0L)
  }

  test("manifest commit closes the consolidate reader race: a reader " +
    "resolved pre-consolidate finishes over the old snapshot, fresh " +
    "readers flip atomically, crashed passes are invisible") {
    val n = 64
    def grid(lo: Long, hi: Long) = spark.range(lo, hi).select(
      (col("id") / n % n).cast("long").as("ix"), (col("id") % n).as("iy"),
      col("id").as("v"))
    val dir = java.nio.file.Files.createTempDirectory("zrace").toString
    Layout.zorderWrite(grid(0L, 2000L), col("ix"), col("iy"), 2, dir)
    Layout.zorderAppend(grid(2000L, 2500L), col("ix"), col("iy"), dir)
    assert(Layout.zorderOptimize(spark, dir, 2) == 500L)

    // reader A resolves its file list NOW (spark.read.parquet builds
    // its file index eagerly): gen-0 + gen-1
    val readerA = Layout.zorderTable(spark, dir)
    assert(readerA.inputFiles.nonEmpty)

    assert(Layout.zorderConsolidate(spark, dir, 2) == 2500L)

    // reader A scans AFTER the consolidate committed — pre-r19 this was
    // the documented FileNotFoundException window; now the retired
    // generations are still on disk and the scan completes over the
    // consistent pre-consolidate snapshot
    assert(readerA.count() == 2500L)
    assert(readerA.select(countDistinct("v")).collect()(0).getLong(0) == 2500L)

    // a fresh reader resolves the NEW snapshot atomically: only the
    // merged generation, no double-reads from the lingering inputs
    val readerB = Layout.zorderTable(spark, dir)
    assert(readerB.count() == 2500L)
    assert(readerB.inputFiles.forall(_.contains("gen-2")),
      readerB.inputFiles.filterNot(_.contains("gen-2")).mkString(","))

    // a CRASHED maintenance pass (generation written, manifest never
    // committed) is invisible to readers …
    grid(9000L, 9100L)
      .withColumn("z_key", Layout.zorderKey(col("ix"), col("iy")))
      .write.parquet(s"$dir/gen-7")
    assert(Layout.zorderTable(spark, dir).count() == 2500L,
      "uncommitted generation leaked into the read")
    // … and the next maintenance pass reclaims it
    Layout.zorderAppend(grid(2500L, 2600L), col("ix"), col("iy"), dir)
    assert(Layout.zorderOptimize(spark, dir, 2) == 100L)
    assert(!new java.io.File(s"$dir/gen-7").exists(),
      "crashed-pass orphan not reclaimed")
    assert(Layout.zorderTable(spark, dir).count() == 2600L)

    // the optimize commit is atomic the same way: tail files retire in
    // the instant gen-8 goes live (gen numbering skips the reclaimed
    // orphan's slot only if lower — here next = max+1 over live+disk)
    val postOpt = Layout.zorderTable(spark, dir)
    assert(postOpt.inputFiles.count(_.contains("/tail/")) == 0,
      "retired tail files still visible to a fresh reader")

    // vacuum reclaims the retired inputs; results unchanged
    assert(Layout.vacuum(spark, dir, force = true) > 0L)
    assert(!new java.io.File(s"$dir/gen-0").exists())
    assert(Layout.zorderTable(spark, dir).count() == 2600L)
  }

  test("generations discovery ignores foreign gen-* entries instead of " +
    "failing the lifecycle") {
    val n = 64
    def grid(lo: Long, hi: Long) = spark.range(lo, hi).select(
      (col("id") / n % n).cast("long").as("ix"), (col("id") % n).as("iy"),
      col("id").as("v"))
    val dir = java.nio.file.Files.createTempDirectory("zforeign").toString
    Layout.zorderWrite(grid(0L, 1000L), col("ix"), col("iy"), 2, dir)
    // a stray backup dir that used to throw NumberFormatException and
    // permanently brick every optimize pass on the table
    assert(new java.io.File(s"$dir/gen-0.bak").mkdir())
    assert(new java.io.File(s"$dir/gen-tmp").mkdir())
    Layout.zorderAppend(grid(1000L, 1200L), col("ix"), col("iy"), dir)
    assert(Layout.zorderOptimize(spark, dir, 2) == 200L)
    assert(spark.read.parquet(s"$dir/gen-1").count() == 200L)
    assert(Layout.zorderTable(spark, dir).count() == 1200L)
  }

  test("mergeRanges: covers every key, respects the budget, merges " +
    "consecutive runs for free") {
    val keys = Seq(1L, 2L, 3L, 7L, 8L, 20L, 21L, 22L, 40L, 90L, 91L)
    val free = Layout.mergeRanges(keys, maxRanges = 100)
    assert(free == Seq((1L, 3L), (7L, 8L), (20L, 22L), (40L, 40L), (90L, 91L)))
    val capped = Layout.mergeRanges(keys, maxRanges = 3)
    assert(capped.length <= 3)
    // superset: every key inside some range; ranges ascending disjoint
    keys.foreach(k => assert(capped.exists { case (lo, hi) =>
      lo <= k && k <= hi }, s"key $k lost by the cap"))
    capped.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 < b._1, s"$a $b overlap")
      case _ =>
    }
    // the cap swallows the SMALLEST gaps first: the 90-91 run (gap 50)
    // and 40 (gap 18) survive as separate ranges
    assert(capped == Seq((1L, 22L), (40L, 40L), (90L, 91L)))
  }

  // --- M72 bloom-filter point-lookup layout -----------------------------

  test("bloomLayout: point lookup scans a fraction of the row groups, same rows") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = spark.range(2000000L).select(
      col("id"),
      pmod(xxhash64(col("id")), lit(1000000000L)).as("k"),
      concat(lit("payload_"), col("id")).as("payload"))
    def write(path: String, bloom: Boolean): Unit = {
      var w = Layout.bloomLayout(df, "k", numFiles = 4)
        .write.mode("overwrite")
        .option("parquet.block.size", (1 << 20).toString)
      if (bloom) Layout.bloomWriteOptions("k", expectedNdv = 600000L,
        rowGroupBytes = 1 << 20).foreach { case (o, v) => w = w.option(o, v) }
      w.parquet(path)
    }
    val base = java.nio.file.Files.createTempDirectory("bloom").toString
    write(s"$base/with", bloom = true)
    write(s"$base/without", bloom = false)
    val probe = df.where(col("id").isin(5L, 55555L, 555555L))
      .select("k").collect().map(_.getLong(0)).toSeq
    def run(path: String): (Set[Long], Long) = {
      val q = Layout.pointLookup(spark, path, "k", probe)
      val ids = q.collect().map(_.getAs[Long]("id")).toSet
      val scanned = q.queryExecution.executedPlan.collectLeaves()
        .collect { case s: FileSourceScanExec => s }
        .head.metrics("numOutputRows").value
      (ids, scanned)
    }
    val (idsB, scannedB) = run(s"$base/with")
    val (idsN, scannedN) = run(s"$base/without")
    assert(idsB == idsN) // pruning is lossless
    assert(idsB.contains(5L) && idsB.contains(55555L) && idsB.contains(555555L))
    // without blooms a hash key defeats min/max stats: everything is read
    assert(scannedN == 2000000L, s"expected full scan, got $scannedN")
    // with blooms only the row groups that may hold a probe key survive
    assert(scannedB < 2000000L / 10,
      s"bloom scan read $scannedB rows - row-group pruning not engaged")
  }

  test("bootstrap crash window CLOSED: a maintenance pass on a " +
    "manifest-less table seals FIRST, so a half-written generation is " +
    "purged on retry, never adopted") {
    val n = 64
    def grid(lo: Long, hi: Long) = spark.range(lo, hi).select(
      (col("id") / n % n).cast("long").as("ix"), (col("id") % n).as("iy"),
      col("id").as("v"))
    // bootstrap-by-append: a fresh dir that has ONLY tail files — the
    // streaming-ingest shape, no manifest, no generations
    val dir = java.nio.file.Files.createTempDirectory("zboot").toString
    Layout.zorderAppend(grid(0L, 1000L), col("ix"), col("iy"), dir)
    // a previous pass crashed after writing its generation but before
    // its commit — under the FIXED protocol that pass sealed a manifest
    // before writing, so replay the fixed sequence: seal, then the
    // orphaned generation (duplicates of the tail rows, the poison the
    // old listing fallback would adopt)
    Layout.sealInitial(spark, dir)
    grid(0L, 1000L)
      .withColumn("z_key", Layout.zorderKey(col("ix"), col("iy")))
      .write.parquet(s"$dir/gen-7")
    // retry pass: the crashed gen-7 must be INVISIBLE (manifest-governed
    // live set) and physically purged; the tail compacts exactly once
    val compacted = Layout.zorderOptimize(spark, dir, numFiles = 2)
    assert(compacted == 1000L, s"retry compacted $compacted rows")
    assert(Layout.zorderTable(spark, dir).count() == 1000L,
      "crashed generation leaked duplicate rows into the table")
    assert(!new java.io.File(s"$dir/gen-7").exists(),
      "crashed generation must be purged by the retry pass")
    // and the general contract: the FIRST pass on any manifest-less
    // table leaves it manifest-governed with the seal preceding the
    // pass's own commit (seq 0 = seal, seq 1 = the pass)
    val dir2 = java.nio.file.Files.createTempDirectory("zboot2").toString
    Layout.zorderAppend(grid(0L, 500L), col("ix"), col("iy"), dir2)
    Layout.zorderOptimize(spark, dir2, numFiles = 2)
    val fs = new org.apache.hadoop.fs.Path(dir2)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = graft.ops.TableManifest.latest(fs,
      new org.apache.hadoop.fs.Path(dir2)).get
    assert(m.seq >= 1, "expected a seal commit BEFORE the pass commit")
    assert(m.gens == Some(Seq("gen-0")))
  }

  test("vacuum retention guard: unforced vacuum right after a " +
    "consolidate is a no-op; force reclaims now") {
    val n = 64
    def grid(lo: Long, hi: Long) = spark.range(lo, hi).select(
      (col("id") / n % n).cast("long").as("ix"), (col("id") % n).as("iy"),
      col("id").as("v"))
    val dir = java.nio.file.Files.createTempDirectory("zvac").toString
    Layout.zorderWrite(grid(0L, 2000L), col("ix"), col("iy"), 2, dir)
    Layout.zorderAppend(grid(2000L, 2500L), col("ix"), col("iy"), dir)
    Layout.zorderOptimize(spark, dir, numFiles = 2)
    Layout.zorderConsolidate(spark, dir, numFiles = 2)
    def genDirs() = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array[java.io.File]())
      .count(f => f.isDirectory && f.getName.matches("gen-\\d+"))
    val before = genDirs()
    assert(before > 1, "fixture must leave retired generations on disk")
    // the manifest is seconds old: its retired files may still have
    // in-flight readers — the unforced call must refuse
    assert(Layout.vacuum(spark, dir) == 0L,
      "unforced vacuum inside the retention window must be a no-op")
    assert(genDirs() == before, "unforced vacuum deleted retired files")
    assert(Layout.vacuum(spark, dir, force = true) > 0L)
    assert(genDirs() == 1, "forced vacuum must reclaim retired gens")
    assert(Layout.zorderTable(spark, dir).count() == 2500L)
  }
}
