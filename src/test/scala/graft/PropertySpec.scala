package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.model.RegularGrid
import graft.ops.{Grouping, Regrid, Speciation}
import graft.profiles.Profiles

/** Property-style invariants over seeded random inputs — the reference's
  * oracle families (SURVEY §5 / FIXTURES.md §5): mass conservation,
  * weight bounds, ratio normalization, speciation totals. */
class PropertySpec extends SparkSpec {

  private val rnd = new Random(42)

  private def randomGridPair(): (RegularGrid, RegularGrid) = {
    val src = RegularGrid(2 + rnd.nextInt(6), 2 + rnd.nextInt(6), 0.0, 0.0, 1.0, 1.0)
    // dst covers src with margin; dyadic offset/size so sums stay exact
    val off = -1.0 - rnd.nextInt(3) * 0.25
    val d = 1.0 + rnd.nextInt(3) * 0.5
    val nx = math.ceil((src.xmax - off + 1.0) / d).toInt
    val ny = math.ceil((src.ymax - off + 1.0) / d).toInt
    (src, RegularGrid(nx, ny, off, off, d, d))
  }

  private def randomInv(g: RegularGrid) = {
    val rows = (0 until 30).map { _ =>
      (rnd.nextLong(g.ncells), s"c${rnd.nextInt(3)}", s"s${rnd.nextInt(2)}",
        (1 + rnd.nextInt(100)).toDouble)
    }
    spark.createDataFrame(rows).toDF("cell_id", "category", "substance", "value")
  }

  test("property: weights in (0,1], per-src sum == 1 under covering dst") {
    (1 to 6).foreach { _ =>
      val (src, dst) = randomGridPair()
      val rows = Regrid.weights(spark, src, dst).collect()
      assert(rows.forall(r => r.getDouble(2) > 0 && r.getDouble(2) <= 1.0 + 1e-12))
      rows.groupBy(_.getLong(0)).foreach { case (_, ws) =>
        assert(math.abs(ws.map(_.getDouble(2)).sum - 1.0) < 1e-9)
      }
    }
  }

  test("property: remap conserves per-(cat,sub) mass") {
    (1 to 6).foreach { _ =>
      val (src, dst) = randomGridPair()
      val emi = randomInv(src)
      val diff = Grouping.conservationDiff(
        emi, Regrid.remapInventory(spark, emi, src, dst)).collect()
      diff.foreach(r => assert(math.abs(r.getDouble(4)) < 1e-9))
    }
  }

  test("property: normalize yields ratios summing to 1, preserving support") {
    (1 to 6).foreach { _ =>
      val rows = (0 until 40).map { i =>
        (rnd.nextInt(5), i, (1 + rnd.nextInt(50)).toDouble)
      }
      val p = spark.createDataFrame(rows).toDF("profile_id", "pos", "w")
      val sums = Profiles.normalize(p)
        .groupBy("profile_id").agg(sum("ratio")).collect()
      sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-12))
    }
  }

  test("property: speciation daughters sum to parent x ratio-sum") {
    (1 to 6).foreach { _ =>
      val emi = randomInv(RegularGrid(4, 4, 0, 0, 1, 1))
      val r1 = 0.25 * (1 + rnd.nextInt(3))
      val r2 = 0.25 * (1 + rnd.nextInt(3))
      val out = Speciation.speciate(spark, emi, Seq(
        ("c0", "s0", "d1", r1), ("c0", "s0", "d2", r2)))
      val tin = totalsBySub(emi).getOrElse(("c0", "s0"), 0.0)
      val t = totalsBySub(out)
      val daughters = t.getOrElse(("c0", "d1"), 0.0) + t.getOrElse(("c0", "d2"), 0.0)
      assert(math.abs(daughters - tin * (r1 + r2)) < 1e-9)
    }
  }

  test("property: NetCDF writer round-trips random variables bit-exactly") {
    import graft.sources.NetcdfClassic
    import graft.sinks.NetcdfWriter
    import graft.sinks.NetcdfWriter.WriteVar
    import NetcdfClassic.{NcDim, NcDouble, NcFloat, NcInt, NcShort}
    (1 to 8).foreach { _ =>
      val nx = 1 + rnd.nextInt(7); val ny = 1 + rnd.nextInt(5)
      val recs = rnd.nextInt(4)
      val doubles = Array.fill(nx * ny)(rnd.nextDouble() * 1e6 - 5e5)
      val floats = Array.fill(nx * ny)(rnd.nextFloat().toDouble) // exact in double
      val ints = Array.fill(nx)(rnd.nextInt().toDouble)
      val shorts = Array.fill(ny)(rnd.nextInt(65536).toShort.toDouble)
      val recData = Array.fill(recs * nx)(rnd.nextDouble())
      val version = 1 + rnd.nextInt(2)
      val bytes = NetcdfWriter.write(
        Seq(NcDim("t", 0), NcDim("y", ny), NcDim("x", nx)),
        Nil,
        Seq(
          WriteVar("d", Seq("y", "x"), NcDouble, doubles = doubles),
          WriteVar("f", Seq("y", "x"), NcFloat, doubles = floats),
          WriteVar("i", Seq("x"), NcInt, doubles = ints),
          WriteVar("s", Seq("y"), NcShort, doubles = shorts),
          WriteVar("r", Seq("t", "x"), NcDouble, doubles = recData)),
        numrecs = recs, version = version)
      val f = NetcdfClassic.readHeader(bytes)
      assert(f.version == version && f.numrecs == recs)
      assert(NetcdfClassic.readVarDoubles(bytes, f, "d").toSeq == doubles.toSeq)
      assert(NetcdfClassic.readVarDoubles(bytes, f, "f").toSeq == floats.toSeq)
      assert(NetcdfClassic.readVarDoubles(bytes, f, "i").toSeq == ints.toSeq)
      assert(NetcdfClassic.readVarDoubles(bytes, f, "s").toSeq == shorts.toSeq)
      assert(NetcdfClassic.readVarDoubles(bytes, f, "r").toSeq == recData.toSeq)
    }
  }

  test("property: FileGDB shapes round-trip on the quantization lattice") {
    import GdbFixtures._
    import graft.sources.FileGdb
    import graft.sources.FileGdb._
    (1 to 8).foreach { _ =>
      // coordinates on the 1e-4 lattice (the fixture xyscale) round-trip
      // exactly through the varint delta encoding
      def coord(): Double = math.round(rnd.nextDouble() * 2e7 - 1e7) / 1e4
      val nPts = 2 + rnd.nextInt(6)
      val nParts = 1 + rnd.nextInt(2)
      val parts = (0 until nParts).map(_ =>
        (0 until nPts).map(_ => (coord(), coord())))
      val shapeType = if (rnd.nextBoolean()) 3 else 5
      val fields = Seq(
        FField("OBJECTID", TObjectId),
        FField("v", TFloat64, nullable = true),
        FField("SHAPE", TGeometry, nullable = true))
      val dir = java.nio.file.Files.createTempDirectory("gdbprop")
      val (t, tx) = buildTable(fields, Seq(
        Seq(FNull, FDouble(rnd.nextDouble()), FShape(shapeType, parts))))
      java.nio.file.Files.write(dir.resolve("p.gdbtable"), t)
      java.nio.file.Files.write(dir.resolve("p.gdbtablx"), tx)
      val (_, rows) = FileGdb.readTable(dir.resolve("p.gdbtable").toString)
      val s = rows(0)("SHAPE").asInstanceOf[Shape]
      assert(s.shapeType == shapeType)
      assert(s.xs.size == nParts)
      parts.zipWithIndex.foreach { case (p, k) =>
        p.zipWithIndex.foreach { case ((x, y), i) =>
          assert(math.abs(s.xs(k)(i) - x) < 1e-9, s"x($k,$i)")
          assert(math.abs(s.ys(k)(i) - y) < 1e-9, s"y($k,$i)")
        }
      }
    }
  }

  test("property: WKB round-trips random multi-ring polygons bit-exactly") {
    import graft.sources.Wkb
    (1 to 8).foreach { _ =>
      val nPolys = 1 + rnd.nextInt(3)
      val polys = Seq.fill(nPolys) {
        val nRings = 1 + rnd.nextInt(3)
        Seq.fill(nRings) {
          val n = 3 + rnd.nextInt(6)
          val xs = Array.fill(n)(rnd.nextDouble() * 360 - 180)
          val ys = Array.fill(n)(rnd.nextDouble() * 180 - 90)
          (xs :+ xs.head, ys :+ ys.head) // close the ring
        }
      }
      val g = Wkb.decode(Wkb.encodeMultiPolygon(polys))
      assert(g.kind == "multipolygon")
      val got = g.parts.map(p => (p.part, p.ring, p.xs.toSeq, p.ys.toSeq))
      val want = polys.zipWithIndex.flatMap { case (rings, pi) =>
        rings.zipWithIndex.map { case ((xs, ys), ri) =>
          (pi, ri, xs.toSeq, ys.toSeq)
        }
      }
      assert(got == want)
    }
  }

  test("property: OSM stitcher reassembles a segmented ring under reversals") {
    import graft.sources.OsmJson
    (1 to 10).foreach { _ =>
      val n = 6 + rnd.nextInt(10)
      val ringNodes = (0 until n).map(i => 100L + i) :+ 100L // closed
      // cut into consecutive segments of >= 2 nodes (shared endpoints)
      val cuts = (1 until n).filter(_ => rnd.nextBoolean()).take(3).sorted
      val bounds = (0 +: cuts :+ n).distinct
      val segments = bounds.sliding(2).map { case Seq(a, b) =>
        ringNodes.slice(a, b + 1)
      }.toSeq
      // randomly reverse segments after the first (the stitcher matches
      // either endpoint and reverses as needed, osm.py:105-133)
      val ways = segments.head +: segments.tail.map(s =>
        if (rnd.nextBoolean()) s.reverse else s)
      val json =
        ("""{"elements": [""" +
          ringNodes.distinct.map(id =>
            s"""{"type": "node", "id": $id, "lon": ${(id % 37) / 10.0}, "lat": ${(id % 23) / 10.0}}""")
            .mkString(",") + "," +
          ways.zipWithIndex.map { case (w, i) =>
            s"""{"type": "way", "id": ${500 + i}, "nodes": [${w.mkString(",")}]}"""
          }.mkString(",") + "," +
          s"""{"type": "relation", "id": 900, "members": [""" +
          ways.indices.map(i =>
            s"""{"type": "way", "ref": ${500 + i}, "role": "outer"}""")
            .mkString(",") +
          """], "tags": {"type": "multipolygon"}}]}""")
      val dir = java.nio.file.Files.createTempDirectory("osmprop")
      val p = dir.resolve("ring.json")
      java.nio.file.Files.write(p, json.getBytes("UTF-8"))
      val parts = OsmJson.read(spark, p.toString).collect()
      Caching.release()
      assert(parts.length == 1, s"segments=$segments ways=$ways")
      val r = parts.head
      assert(r.getString(6) == "polygon")
      // the ring visits every node exactly once plus the closing vertex
      assert(r.getSeq[Double](7).length == n + 1)
    }
  }

  test("property: paragraphDedup accounting and lossless high-threshold pass") {
    import graft.dedup.Dedup
    (1 to 4).foreach { round =>
      val vocab = 5 + round // small vocab forces cross-doc chunk collisions
      val docs = spark.createDataFrame((0L until 25L).map { i =>
        val n = 4 + rnd.nextInt(12)
        (i, Seq.fill(n)(s"w${rnd.nextInt(vocab)}").mkString(" "))
      }).toDF("doc_id", "text")
      val chunkWords = 1 + rnd.nextInt(3)
      val out = Dedup.paragraphDedup(docs, chunkWords, minDocs = 2).collect()
        .map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // every doc survives; chunk accounting matches the text length;
      // clean_text is a subsequence of the original chunks in order
      assert(out.keySet == texts.keySet)
      out.foreach { case (id, (clean, nChunks, nDropped)) =>
        val words = texts(id).split(" ")
        val expChunks = math.ceil(words.length.toDouble / chunkWords).toLong
        assert(nChunks == expChunks, s"doc $id")
        val chunks = words.grouped(chunkWords).map(_.mkString(" ")).toSeq
        val kept = if (clean.isEmpty) Seq.empty else {
          // reconstruct kept chunks by matching greedily in order
          var rest = chunks
          val keptChunks = scala.collection.mutable.Buffer[String]()
          var remaining = clean
          while (remaining.nonEmpty) {
            val c = rest.find(ch => remaining == ch ||
              remaining.startsWith(ch + " ")).getOrElse(
              fail(s"doc $id: '$remaining' not prefixed by any chunk"))
            keptChunks += c
            rest = rest.drop(rest.indexOf(c) + 1)
            remaining = remaining.drop(c.length).stripPrefix(" ")
          }
          keptChunks.toSeq
        }
        assert(kept.size + nDropped == nChunks, s"doc $id accounting")
      }
      // with an impossible minDocs the pass is lossless
      val lossless = Dedup.paragraphDedup(docs, chunkWords, minDocs = 1000)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(lossless == texts, "minDocs beyond corpus size must keep all text")
    }
  }

  test("property: ring weights conserve net polygon area inside the grid") {
    val g = RegularGrid(8, 8, 0.0, 0.0, 1.0, 1.0)
    (1 to 6).foreach { seed =>
      val r = new Random(seed)
      // random shell within the grid, dyadic coords; random hole inside
      def d(lo: Double, hi: Double) = lo + r.nextInt(((hi - lo) * 4).toInt) / 4.0
      val (sx0, sy0) = (d(0, 4), d(0, 4))
      val (sx1, sy1) = (d(sx0 + 1, 8), d(sy0 + 1, 8))
      val (hx0, hy0) = (d(sx0, sx1 - 0.25), d(sy0, sy1 - 0.25))
      val (hx1, hy1) = (d(hx0 + 0.25, sx1), d(hy0 + 0.25, sy1))
      val rows = Seq(
        ("P", 0, Array(sx0, sx1, sx1, sx0), Array(sy0, sy0, sy1, sy1)),
        ("P", 1, Array(hx0, hx1, hx1, hx0), Array(hy0, hy0, hy1, hy1)))
      val df = spark.createDataFrame(rows).toDF("poly_id", "ring", "xs", "ys")
      val total = graft.ops.SpatialJoin.polyGridWeightsRings(spark, g, df)
        .agg(org.apache.spark.sql.functions.sum("area")).head.getDouble(0)
      val expected =
        (sx1 - sx0) * (sy1 - sy0) - (hx1 - hx0) * (hy1 - hy0)
      assert(math.abs(total - expected) < 1e-9,
        s"seed=$seed total=$total expected=$expected")
    }
  }

  test("property: PII scrub is idempotent and counts match placeholders") {
    val words = Seq("alpha", "beta", "a.b+c@mail-x.org", "10.20.30.40",
      "+4179123456789", "1.2.3", "gamma@no", "+12", "x@y.io")
    val docs = spark.createDataFrame((0L until 40L).map { i =>
      val r = new Random(i)
      (i, Seq.fill(12)(words(r.nextInt(words.length))).mkString(" "))
    }).toDF("doc_id", "text")
    val once = graft.text.PiiScrub.scrub(docs).select(
      col("doc_id"), col("clean"), col("n_emails"), col("n_ips"), col("n_phones"))
    val rows = once.collect()
    rows.foreach { r =>
      val clean = r.getString(1)
      // every removal left exactly one typed placeholder
      assert("<EMAIL>".r.findAllIn(clean).length == r.getInt(2))
      assert("<IP>".r.findAllIn(clean).length == r.getInt(3))
      assert("<PHONE>".r.findAllIn(clean).length == r.getInt(4))
    }
    // scrubbing scrubbed text changes nothing and finds nothing
    val twice = graft.text.PiiScrub.scrub(
      once.select(col("doc_id"), col("clean").as("text"))).collect()
    val cleanById = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
    twice.foreach { r =>
      assert(r.getAs[String]("clean") == cleanById(r.getLong(0)))
      assert(r.getAs[Int]("n_emails") + r.getAs[Int]("n_ips") +
        r.getAs[Int]("n_phones") == 0)
    }
  }

  test("property: URL canonicalization is idempotent over crawl variants") {
    val urls = (0L until 60L).map { i =>
      val r = new Random(i)
      val scheme = Seq("http", "HTTP", "https", "HTTPS")(r.nextInt(4))
      val port = Seq("", ":80", ":443", ":8080")(r.nextInt(4))
      val params = Random.javaRandomToRandom(new java.util.Random(i))
        .shuffle(Seq("utm_source=x", "b=2", "a=1", "fbclid=z", "z=9"))
        .take(1 + r.nextInt(4)).mkString("&")
      val frag = Seq("", "#sec")(r.nextInt(2))
      (i, s"$scheme://Host${i % 7}.Example.COM$port/p/${i % 13}?$params$frag")
    }
    val docs = spark.createDataFrame(urls).toDF("doc_id", "url")
    val c1 = docs.select(col("doc_id"), graft.text.UrlOps.canonical(col("url")).as("url"))
    val c2 = c1.select(col("doc_id"), graft.text.UrlOps.canonical(col("url")).as("url"))
    val m1 = c1.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val m2 = c2.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m1 == m2, "canonical must be a fixpoint")
    m1.values.foreach { u =>
      assert(!u.contains("#") && !u.contains("utm_") && !u.contains("fbclid"))
      assert(u.startsWith("http://host") || u.startsWith("https://host"))
    }
  }

  test("property: FIM splits reconstruct exactly and are deterministic") {
    val texts = (0 until 50).map { i =>
      val n = rnd.nextInt(120) // includes 0-length
      (i.toLong, (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    }
    val d = spark.createDataFrame(texts).toDF("doc_id", "text")
    def run() = graft.text.TextAnalysis.fimSplit(d).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getString(3))).toMap
    val a = run(); val b = run()
    assert(a == b, "fimSplit must be deterministic")
    texts.foreach { case (id, t) =>
      val (p, m, s) = a(id)
      assert(p + m + s == t, s"doc $id: FIM parts must reconstruct the text")
    }
    // the cuts actually move: over 50 docs, not everything is one part
    assert(a.values.count(v => v._2.nonEmpty) > 10, "middles all empty?")
  }

  test("property: CDC chunks reconstruct any text exactly, in order") {
    // random low-alphabet texts (high boundary-collision rates) plus
    // degenerate shapes: single word, all-identical words, empty-ish
    val texts = (0 until 40).map { i =>
      val n = 1 + rnd.nextInt(80)
      (i.toLong, (0 until n).map(_ => s"w${rnd.nextInt(12)}").mkString(" "))
    } ++ Seq((100L, "solo"), (101L, Seq.fill(50)("same").mkString(" ")))
    val d = spark.createDataFrame(texts).toDF("doc_id", "text")
    Seq(2, 8, 64).foreach { mod => // mod > any hash: single tail chunk
      val rebuilt = graft.text.TextAnalysis.cdcChunks(d, boundaryMod = mod)
        .collect()
        .groupBy(_.getLong(0))
        .map { case (id, rs) =>
          id -> rs.sortBy(_.getLong(1)).map(_.getString(2)).mkString(" ") }
      texts.foreach { case (id, t) =>
        assert(rebuilt(id) == t, s"doc $id not reconstructed at mod=$mod")
      }
    }
  }

  test("property: release manifest is invariant under ordering and partitioning") {
    // the manifest's additive checksum + aggregates must be identical
    // for ANY physical arrangement of the same logical corpus — the
    // property that makes the artifact citable from a 1000-executor run
    val texts = (0 until 60).map { i =>
      val n = 1 + rnd.nextInt(30)
      (i.toLong, (0 until n).map(_ => s"t${rnd.nextInt(50)}").mkString(" "))
    }
    val d = spark.createDataFrame(texts).toDF("doc_id", "text")
    val base = collectSet(graft.ops.CorpusStats.releaseManifest(d, shards = 4))
    val variants = Seq(
      d.orderBy(col("text").desc),
      d.repartition(7, col("doc_id")),
      d.repartition(1),
      d.orderBy(rand(7)))
    variants.foreach { v =>
      assert(collectSet(graft.ops.CorpusStats.releaseManifest(v, shards = 4)) == base)
    }
  }

  test("property: snapshotDiff statuses partition the id space; lengths consistent") {
    val olds = (0 until 40).map(i =>
      (i.toLong, if (rnd.nextInt(5) == 0) null else s"v${rnd.nextInt(3)}"))
    val news = (20 until 60).map(i =>
      (i.toLong, if (rnd.nextInt(5) == 0) null else s"v${rnd.nextInt(3)}"))
    val out = graft.ops.CorpusStats.snapshotDiff(
      spark.createDataFrame(olds).toDF("doc_id", "text"),
      spark.createDataFrame(news).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val om = olds.toMap; val nm = news.toMap
    assert(out.map(_._1).toSet == (om.keySet ++ nm.keySet)) // total, no dup
    assert(out.length == (om.keySet ++ nm.keySet).size)
    out.foreach { case (id, status, ol, nl) =>
      val expected =
        if (!om.contains(id)) "added"
        else if (!nm.contains(id)) "removed"
        else if (om(id) == nm(id)) "unchanged" // null == null → unchanged
        else "changed"
      assert(status == expected, s"doc $id: $status != $expected")
      assert(ol == (if (om.contains(id) && om(id) != null) om(id).length.toLong else -1L))
      assert(nl == (if (nm.contains(id) && nm(id) != null) nm(id).length.toLong else -1L))
    }
  }
}
