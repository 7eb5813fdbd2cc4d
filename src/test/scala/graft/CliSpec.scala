package graft

/** The CLI dispatcher (reference counterpart: emiproc/__main__.py — a
  * deprecated argparse stub; the engine's CLI maps its REAL mains). */
class CliSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def captureOut(body: => Unit): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos, true, "UTF-8"))(body)
    bos.toString("UTF-8")
  }

  private def captureErr(body: => Unit): String = {
    val bos = new java.io.ByteArrayOutputStream()
    val prev = System.err
    System.setErr(new java.io.PrintStream(bos, true, "UTF-8"))
    try body finally System.setErr(prev)
    bos.toString("UTF-8")
  }

  test("no args prints usage with every command, exit 0") {
    var code = -1
    val out = captureOut { code = Cli.run(Array.empty) }
    assert(code == 0)
    Seq("smoke", "verify", "bench", "run", "scalebench", "queries")
      .foreach(c => assert(out.contains(c), s"usage lacks '$c'"))
  }

  test("unknown command goes to stderr with nonzero exit code " +
    "(a typo must not look like a successful run to a CI script)") {
    var code = -1
    val err = captureErr { code = Cli.run(Array("nope")) }
    assert(code == 2)
    assert(err.contains("unknown command: nope"))
    assert(err.contains("usage:"))
  }

  test("bm25-index / bm25-search / ann-search serve persisted artifacts " +
    "from the command line") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("clisrv").toString
    spark.range(30).select(col("id").as("doc_id"),
      concat(lit("alpha tok"), col("id")).as("text"))
      .write.parquet(s"$dir/docs")
    var code = -1
    val out1 = captureOut {
      code = Cli.run(Array("bm25-index", s"$dir/docs", s"$dir/bm25", "2"))
    }
    assert(code == 0 && out1.contains("built"), out1)
    val out2 = captureOut {
      code = Cli.run(Array("bm25-search", s"$dir/bm25", "tok7"))
    }
    assert(code == 0)
    // tok7 is unique to doc 7 — it must be rank 1
    assert(out2.linesIterator.next().contains("doc 7"), out2)

    spark.range(30).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(3)),
        d => ((col("id") % 5) + d).cast("float")).as("embedding"))
      .write.parquet(s"$dir/emb")
    graft.similarity.Similarity.ivfPqWriteIndexTrained(
      spark.read.parquet(s"$dir/emb"), s"$dir/ann", numFiles = 2,
      m = 2, dims = 4, ksub = 4, nlists = 2, iters = 1, trainMod = 3)
    spark.read.parquet(s"$dir/emb").where(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding"))
      .write.parquet(s"$dir/q")
    val out3 = captureOut {
      code = Cli.run(Array("ann-search", s"$dir/ann", s"$dir/q",
        "3", "2", "2", "4", "1"))
    }
    assert(code == 0)
    assert(out3.linesIterator.size == 6, s"want 2 queries x k=3:\n$out3")

    val err = captureErr { code = Cli.run(Array("bm25-search", "onlydir")) }
    assert(code == 2 && err.contains("missing arguments"))
  }

  test("ann-rerank serves the IVFPQ+refine path; the vacuum commands " +
    "reclaim retired lifecycle files") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("clirr").toString
    spark.range(30).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(3)),
        d => ((col("id") % 5) + d).cast("float")).as("embedding"))
      .write.parquet(s"$dir/emb")
    graft.similarity.Similarity.ivfPqWriteIndexTrained(
      spark.read.parquet(s"$dir/emb"), s"$dir/ann", numFiles = 2,
      m = 2, dims = 4, ksub = 4, nlists = 2, iters = 1, trainMod = 3,
      storeVecs = true)
    spark.read.parquet(s"$dir/emb").where(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding"))
      .write.parquet(s"$dir/q")
    var code = -1
    val out = captureOut {
      code = Cli.run(Array("ann-rerank", s"$dir/ann", s"$dir/q",
        "3", "10", "2", "2", "4", "1"))
    }
    assert(code == 0)
    assert(out.linesIterator.size == 6, s"want 2 queries x k=3:\n$out")
    assert(out.contains("cos 1.0"), // ids 0 and 1 share vectors with
      s"exact duplicates must rerank to cos 1.0:\n$out") // ids %5-equal
    // vacuum: consolidate retires gen-0, the command reclaims it
    graft.similarity.Similarity.ivfPqDeleteIndex(spark, s"$dir/ann",
      spark.createDataFrame(Seq(Tuple1(7L))).toDF("vec_id"))
    graft.similarity.Similarity.ivfPqConsolidateIndex(spark, s"$dir/ann", 2)
    // unforced: the manifest is seconds old, so the retention guard
    // must refuse (its retired files may still have in-flight readers)
    val outv = captureOut {
      code = Cli.run(Array("ann-vacuum", s"$dir/ann"))
    }
    assert(code == 0 && outv.contains("reclaimed 0 "), outv)
    assert(new java.io.File(s"$dir/ann/codes/gen-0").exists(),
      "unforced vacuum must not break the retention window")
    // forced: reclaim now (the documented space-over-window trade)
    val outf = captureOut {
      code = Cli.run(Array("ann-vacuum", s"$dir/ann", "force"))
    }
    assert(code == 0 && outf.contains("(forced)"), outf)
    assert(!new java.io.File(s"$dir/ann/codes/gen-0").exists(),
      "retired generation survived the forced vacuum command")
  }

  test("queries lists every registered gate query and filters by substring") {
    val out = captureOut(Cli.run(Array("queries")))
    val lines = out.linesIterator.toSeq
    assert(lines.last == s"${SparkEntry.queries.size} queries")
    SparkEntry.queries.keys.foreach(q => assert(lines.contains(q)))
    val filtered = captureOut(Cli.run(Array("queries", "gfed")))
    assert(filtered.linesIterator.toSeq.init.forall(_.contains("gfed")))
    assert(filtered.contains("q_gfed4_nf"))
  }
}
