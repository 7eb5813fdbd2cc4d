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
