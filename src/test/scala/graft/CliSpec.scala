package graft

/** The CLI dispatcher (reference counterpart: emiproc/__main__.py — a
  * deprecated argparse stub; the engine's CLI maps its REAL mains). */
class CliSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def captureOut(body: => Unit): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos, true, "UTF-8"))(body)
    bos.toString("UTF-8")
  }

  test("no args / unknown command prints usage with every command") {
    val out = captureOut(Cli.main(Array.empty))
    Seq("smoke", "verify", "bench", "run", "scalebench", "queries")
      .foreach(c => assert(out.contains(c), s"usage lacks '$c'"))
    assert(captureOut(Cli.main(Array("nope"))) == out)
  }

  test("queries lists every registered gate query and filters by substring") {
    val out = captureOut(Cli.main(Array("queries")))
    val lines = out.linesIterator.toSeq
    assert(lines.last == s"${SparkEntry.queries.size} queries")
    SparkEntry.queries.keys.foreach(q => assert(lines.contains(q)))
    val filtered = captureOut(Cli.main(Array("queries", "gfed")))
    assert(filtered.linesIterator.toSeq.init.forall(_.contains("gfed")))
    assert(filtered.contains("q_gfed4_nf"))
  }
}
