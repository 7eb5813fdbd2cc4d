package graft

/** Single command-line entry point over the engine's runtime surfaces —
  * the counterpart of the reference's `emiproc/__main__.py` (which is a
  * deprecated argparse stub that only prints help; emiproc v1 is
  * library-first, and so is this engine — the CLI maps the real mains).
  *
  *   sbt "runMain graft.Cli <command> [args...]"
  *
  * Commands:
  *   smoke                      flagship query on sf0.001 (rows > 0)
  *   verify <sfDir> <outDir>    run every gate query, dump parquet + oracle SQL
  *   bench                      timed headline run (SPARK_GRAFT_SF_DIR)
  *   run <query> [sfDir] [reps] time one gate query by name
  *   scalebench                 the B-series scale proofs (writes BENCH_SCALE.json)
  *   queries [substring]        list registered gate queries
  */
object Cli {

  private val help: String =
    """graft — Spark-native emission-inventory + training-data engine
      |
      |usage: graft.Cli <command> [args...]
      |
      |  smoke                       flagship query on sf0.001 (driver contract)
      |  verify <sfDir> <outDir>     run all gate queries -> parquet + oracle_sql.json
      |  bench                       timed headline run over $SPARK_GRAFT_SF_DIR
      |  run <query> [sfDir] [reps]  time one gate query by name
      |  scalebench                  B-series scale proofs -> BENCH_SCALE.json
      |  queries [substring]         list registered gate queries (optionally filtered)
      |""".stripMargin

  def main(args: Array[String]): Unit = {
    val code = run(args)
    if (code != 0) System.exit(code)
  }

  /** Dispatch, returning a process exit code (separated from [[main]]
    * so specs can exercise the unknown-command path without
    * System.exit killing the test JVM). */
  private[graft] def run(args: Array[String]): Int = args.headOption match {
    case Some("smoke") => Smoke.main(args.tail); 0
    case Some("verify") => Verify.main(args.tail); 0
    case Some("bench") => Bench.main(args.tail); 0
    case Some("run") => RunOne.main(args.tail); 0
    case Some("scalebench") => ScaleBench.main(args.tail); 0
    case Some("queries") =>
      val filter = args.lift(1).getOrElse("")
      val names = SparkEntry.queries.keys.toSeq.sorted
        .filter(_.contains(filter))
      names.foreach(println)
      println(s"${names.length} queries" +
        (if (filter.nonEmpty) s" matching '$filter'" else ""))
      0
    case None =>
      print(help) // bare invocation: asking for help IS success
      0
    case Some(unknown) =>
      // a typo'd command must not look like a successful run to a CI
      // script — usage to stderr, nonzero exit
      System.err.print(s"unknown command: $unknown\n$help")
      2
  }
}
