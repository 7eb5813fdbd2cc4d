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
  *   bm25-index <docs.parquet> <indexDir> [numFiles]
  *                              build the persisted BM25 inverted index
  *   bm25-search <indexDir> <query words...>
  *                              top-10 docs from the persisted index
  *   ann-search <indexDir> <queries.parquet> [k] [nprobe] [m] [dims] [centroidMod]
  *                              persisted IVF+PQ search; queries.parquet
  *                              holds (query_id, embedding). centroidMod
  *                              must match the index's codebook mod: the
  *                              default 1 suits ivfPqWriteIndexTrained
  *                              indexes (codes are codebook indices);
  *                              subset-codebook ivfPqWriteIndex indexes
  *                              need the writer's centroidMod (e.g. 97).
  *   ann-rerank <indexDir> <queries.parquet> [k] [rerankR] [nprobe] [m] [dims] [centroidMod]
  *                              IVFPQ+refine serving: ADC top-rerankR
  *                              candidates exact-reranked from the
  *                              index's vecs relation (storeVecs=true)
  *   bm25-vacuum <indexDir> [force] / ann-vacuum <indexDir> [force]
  *                              reclaim manifest-retired files; without
  *                              `force` the retention guard skips files
  *                              retired younger than one maintenance
  *                              interval (in-flight-reader grace)
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
      |  bm25-index <docs.parquet> <indexDir> [numFiles]
      |                              build the persisted BM25 inverted index
      |  bm25-search <indexDir> <query words...>
      |                              top-10 docs from the persisted index
      |  ann-search <indexDir> <queries.parquet> [k] [nprobe] [m] [dims] [centroidMod]
      |                              persisted IVF+PQ search ((query_id, embedding) parquet);
      |                              centroidMod must match the index writer's codebook mod
      |                              (default 1 = trained indexes; subset writers need theirs)
      |  ann-rerank <indexDir> <queries.parquet> [k] [rerankR] [nprobe] [m] [dims] [centroidMod]
      |                              IVFPQ+refine: exact re-rank from the vecs relation
      |  bm25-vacuum <indexDir>      reclaim manifest-retired BM25 index files now
      |  ann-vacuum <indexDir>       reclaim manifest-retired ANN index files now
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
    // Serving-surface commands (r18): build and query the persisted
    // indexes without writing Scala — the library-first entry points
    // wrapped for operators. Each prints a small result table.
    case Some("bm25-index") if args.length >= 3 =>
      val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      graft.text.Bm25.writeIndex(spark, spark.read.parquet(args(1)),
        args(2), numFiles = args.lift(3).map(_.toInt).getOrElse(16))
      println(s"[bm25-index] built ${args(2)} from ${args(1)}")
      0
    case Some("bm25-search") if args.length >= 3 =>
      val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      graft.text.Bm25.searchPersisted(spark, args(1),
        Seq((0, args.drop(2).mkString(" "))))
        .select("rank", "doc_id", "score").orderBy("rank").collect()
        .foreach(r => println(
          f"[bm25-search] ${r.getInt(0)}%2d  doc ${r.getLong(1)}%-12d " +
            f"${r.getDouble(2)}%.6f"))
      0
    case Some("ann-search") if args.length >= 3 =>
      val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      graft.similarity.Similarity.ivfPqSearchPersistedQ(spark, args(1),
        spark.read.parquet(args(2)),
        k = args.lift(3).map(_.toInt).getOrElse(10),
        m = args.lift(5).map(_.toInt).getOrElse(8),
        dims = args.lift(6).map(_.toInt).getOrElse(64),
        centroidMod = args.lift(7).map(_.toInt).getOrElse(1),
        nprobe = args.lift(4).map(_.toInt).getOrElse(2))
        .select("query_id", "rank", "neighbor_id", "adc_dist")
        .orderBy("query_id", "rank").collect()
        .foreach(r => println(
          s"[ann-search] q${r.get(0)} #${r.getInt(1)} " +
            s"-> ${r.getLong(2)} (adc ${r.getLong(3)})"))
      0
    case Some("ann-rerank") if args.length >= 3 =>
      val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      graft.similarity.Similarity.ivfPqRerankPersistedQ(spark, args(1),
        spark.read.parquet(args(2)),
        k = args.lift(3).map(_.toInt).getOrElse(10),
        rerankR = args.lift(4).map(_.toInt).getOrElse(100),
        nprobe = args.lift(5).map(_.toInt).getOrElse(2),
        m = args.lift(6).map(_.toInt).getOrElse(8),
        dims = args.lift(7).map(_.toInt).getOrElse(64),
        centroidMod = args.lift(8).map(_.toInt).getOrElse(1))
        .select("query_id", "rank", "neighbor_id", "cos_sim")
        .orderBy("query_id", "rank").collect()
        .foreach(r => println(
          s"[ann-rerank] q${r.get(0)} #${r.getInt(1)} " +
            f"-> ${r.getLong(2)} (cos ${r.getDouble(3)}%.6f)"))
      0
    case Some("bm25-vacuum") if args.length >= 2 =>
      val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      val force = args.lift(2).contains("force")
      val n = graft.text.Bm25.vacuumIndex(spark, args(1), force = force)
      println(s"[bm25-vacuum] reclaimed $n retired entries under ${args(1)}" +
        (if (force) " (forced)" else " (retention-guarded; add 'force')"))
      0
    case Some("ann-vacuum") if args.length >= 2 =>
      val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      val force = args.lift(2).contains("force")
      val n = graft.similarity.Similarity
        .ivfPqVacuumIndex(spark, args(1), force = force)
      println(s"[ann-vacuum] reclaimed $n retired entries under ${args(1)}" +
        (if (force) " (forced)" else " (retention-guarded; add 'force')"))
      0
    case Some(cmd @ ("bm25-index" | "bm25-search" | "ann-search"
                     | "ann-rerank" | "bm25-vacuum" | "ann-vacuum")) =>
      System.err.print(s"$cmd: missing arguments\n$help")
      2
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
