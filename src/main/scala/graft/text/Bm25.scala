package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 retrieval over the document corpus for a fixed query set — the
  * lexical-search primitive of a training-data pipeline (query-based
  * corpus exploration, eval-set retrieval, RAG indexing). Okapi BM25
  * (Robertson & Zaragoza 2009) with the Lucene idf variant
  * `ln(1 + (N - df + 0.5)/(df + 0.5))`.
  *
  * Scale shape: the query-term table is a handful of rows and is
  * BROADCAST to the token explode, so the corpus-scale shuffle carries
  * only tokens matching some query term — the inverted-index bound; the
  * per-(doc,term) tf aggregate and per-(query,doc) score aggregate are
  * both keyed by cardinalities that grow with the match set, not the
  * corpus. Global N/avgdl are one single-row aggregate cross-joined in.
  *
  * Numeric design (the 1000-executor reproducibility contract): the only
  * transcendental, ln, is quantized once per TERM to integer
  * micro-units; each (doc, term) contribution is then one fixed-order
  * chain of IEEE divisions/multiplications rounded to integer
  * NANO-units, and the per-document score is an exact BIGINT sum —
  * order-independent across partitions and bit-replayable by any engine
  * (the DuckDB oracle mirrors the arithmetic token-for-token).
  *
  * Top-k is two-phase: a per-(query, doc_id mod 64) salt window keeps k
  * candidates per salt, then the final window ranks ≤ 64·k rows — the
  * global sort never sees more than 64·k rows per query, so a query
  * matching half the corpus cannot funnel it into one task.
  */
object Bm25 {

  private def queryTerms(
      spark: SparkSession, queries: Seq[(Int, String)]): DataFrame =
    broadcast(
      spark.createDataFrame(
        queries.flatMap { case (qid, t) => t.split(" ").map(qid -> _) }.distinct)
        .toDF("query_id", "term"))

  /** The (term, doc_id, dl, tf) postings relation of `docs` — the
    * classic inverted-index row, restricted to `terms` when given (the
    * broadcast pre-filter on the token explode: only words appearing in
    * some query survive to the (doc, term) shuffle). Shared verbatim by
    * the in-plan [[search]] and the index writer ([[writeIndex]] /
    * [[appendIndex]], which persist it UNrestricted), so persisted
    * serving is the same arithmetic as in-plan search by construction. */
  private def postingsOf(
      docs: DataFrame, terms: Option[DataFrame]): DataFrame = {
    val tok = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), size(col("w")).cast("double").as("dl"),
        explode(col("w")).as("term"))
    terms.fold(tok)(t => tok.join(broadcast(t), "term"))
      .groupBy("doc_id", "term")
      .agg(max("dl").as("dl"), count(lit(1)).cast("double").as("tf"))
  }

  /** The scoring tail shared by [[search]] and [[searchPersisted]]:
    * df/idf from the matched postings, the fixed-order contribution
    * chain, the exact BIGINT per-doc sum, and the salted two-phase
    * top-k. `withStat(df, c)` attaches the single corpus statistic
    * named `c` ("n" or "avgdl") to `df` — a crossJoin of the lazy
    * single-row stats relation for the in-plan search, a plain literal
    * column for the persisted path (whose stats are already
    * driver-resolved longs: same IEEE doubles, two broadcast exchanges
    * fewer in every serve plan — guide §2.4). */
  private def scoreAndRank(
      tf: DataFrame,
      withStat: (DataFrame, String) => DataFrame,
      qterms: DataFrame,
      k1: Double,
      b: Double,
      topK: Int): DataFrame = {
    // idf quantized to micro-units per term: |query terms| rows, tiny.
    val idf = withStat(
      tf.groupBy("term").agg(count(lit(1)).cast("double").as("df")), "n")
      .select(col("term"),
        round(log(lit(1.0) + (col("n") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))) * lit(1000000.0)).cast("long")
          .as("idf_micro"))

    // Fixed-order contribution chain — mirrored verbatim by the oracle:
    // idf_micro * (tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))) * 1e3
    val contrib = withStat(tf.join(broadcast(idf), "term"), "avgdl")
      .join(qterms, "term")
      .select(col("query_id"), col("doc_id"),
        round(col("idf_micro") *
          (col("tf") * (lit(k1) + lit(1.0)) /
            (col("tf") + lit(k1) *
              (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))) *
          lit(1000.0)).cast("long").as("contrib_nanos"))

    // ONE exchange for the score aggregate AND the salted window
    // (r22, guide §2.4 "two operations keyed the same way can share
    // one exchange"): the per-(query, doc) sum and the per-(query,
    // salt) window used to pay separate exchanges — hashpartitioning
    // (query_id, _salt) satisfies BOTH the aggregate's clustering
    // (salt is a function of doc_id, so grouping by (query, salt,
    // doc) ≡ (query, doc) — identical groups, identical sums) and the
    // salt window's, so the explicit repartition is the only shuffle
    // before the final ≤ 64·topK-row ranking. Shuffle bytes grow by
    // at most the matched-terms-per-(query,doc) factor (bounded by
    // the query length — map-side partial aggregation used to fold
    // that constant), for one whole exchange + its AQE stage-job
    // removed from every BM25 plan; the salt's scale-safety bound
    // (global sort never sees > 64·topK rows per query) is unchanged.
    val scores = contrib
      .withColumn("_salt", pmod(col("doc_id"), lit(64)))
      .repartition(col("query_id"), col("_salt"))
      .groupBy("query_id", "_salt", "doc_id")
      .agg(sum("contrib_nanos").as("score_nanos"))

    val bySalt = Window
      .partitionBy(col("query_id"), col("_salt"))
      .orderBy(col("score_nanos").desc, col("doc_id").asc)
    val byQuery = Window.partitionBy("query_id")
      .orderBy(col("score_nanos").desc, col("doc_id").asc)
    scores
      .withColumn("_sr", row_number().over(bySalt))
      .where(col("_sr") <= topK)
      .withColumn("rank", row_number().over(byQuery))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_nanos"),
        (col("score_nanos") / lit(1.0e9)).as("score"))
  }

  /** @param queries (query_id, whitespace-tokenized query text)
    * @return (query_id, rank, doc_id, score_nanos, score), rank ≤ topK
    *         per query, ordered by (score desc, doc_id asc). */
  def search(
      spark: SparkSession,
      docs: DataFrame,
      queries: Seq[(Int, String)],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 10): DataFrame = {
    val qterms = queryTerms(spark, queries)
    val d = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
    // N and avgdl: integer sums (exact), one terminal division — the
    // single-row result is cross-joined (broadcast) into the score.
    val stats = d.agg(
      count(lit(1)).cast("double").as("n"),
      (sum(size(col("w"))).cast("double") /
        count(lit(1)).cast("double")).as("avgdl"))
    val tf = postingsOf(docs, Some(qterms.select("term").distinct()))
    scoreAndRank(tf, (df, c) => df.crossJoin(stats.select(c)),
      qterms, k1, b, topK)
  }

  // --- Persisted inverted index (the Lucene-shape serving artifact) ----
  //
  // [[search]] recomputes the postings of its query terms from the raw
  // corpus on EVERY query batch — one full token explode per batch. At
  // 100 TB the lexical leg must serve from a built artifact whose scan
  // cost tracks the QUERY, not the corpus (exactly the r17 persisted
  // IVF+PQ story, M70 — this is its lexical twin). Layout under `dir`:
  //
  //   postings/   (term, doc_id, dl, tf) range-clustered by
  //               (term, doc_id) through the shared
  //               [[graft.ops.Layout]] lifecycle (gen-K + tail +
  //               deletes) — each parquet file owns a contiguous term
  //               range, so the query-term IN (chunked to the session's
  //               parquet pushdown threshold, like the ANN probed-list
  //               union) drops non-matching row groups UNREAD: bytes
  //               read ≈ the queried terms' postings, Lucene's
  //               inverted-list contract as a parquet layout.
  //   docstats/   (doc_id, dl) range-clustered by doc_id — the per-doc
  //               relation deletes are accounted against.
  //   stats/      ADDITIVE (n_docs, sum_dl) batch rows: every write/
  //               append lands one row, every delete a NEGATIVE row, so
  //               the serving-time corpus stats are a sum over a
  //               relation with one row per maintenance op — N and
  //               avgdl stay EXACT (integer sums) under any append/
  //               delete history, which is what keeps persisted scores
  //               bit-identical to an in-plan search over the visible
  //               corpus (Lucene, by contrast, lets deleted docs skew
  //               df/avgdl until segment merge).
  //
  // Appends are shuffle-free on existing data (new postings land in the
  // tail, one narrow explode+aggregate of the NEW docs only); deletes
  // are tombstones ([[graft.ops.Layout.tombstone]] on doc_id) masked by
  // every read and applied physically at consolidate; df needs no
  // stored relation at all — it is a per-term count over the (pruned,
  // tombstone-masked) postings the search already reads, so it is
  // always exactly the visible corpus's df.

  /** Build the persisted BM25 index of `docs` at `dir`. Paid once;
    * [[searchPersisted]] then serves any query workload reading ≈ the
    * queried terms' postings. */
  def writeIndex(
      spark: SparkSession,
      docs: DataFrame,
      dir: String,
      numFiles: Int,
      writerOptions: Map[String, String] = Map.empty): Unit = {
    // the three relation writes are independent (disjoint dirs, shared
    // read-only input) — overlapped on driver threads, guide §2.6
    graft.Par.run(
      () => graft.ops.Layout.clusterInto(
        postingsOf(docs, None)
          .select(col("term"), col("doc_id"), col("dl"), col("tf")),
        numFiles, Seq("term", "doc_id"))
        .write.mode("errorifexists").options(writerOptions)
        .parquet(s"$dir/postings/gen-0"),
      () => graft.ops.Layout.clusterInto(
        docs.select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("dl")),
        math.max(1, numFiles / 4), Seq("doc_id"))
        .write.mode("errorifexists").options(writerOptions)
        .parquet(s"$dir/docstats/gen-0"),
      () => appendStats(spark, dir, docs, sign = 1L))
    graft.ops.Layout.sealInitial(spark, s"$dir/postings")
    graft.ops.Layout.sealInitial(spark, s"$dir/docstats")
  }

  /** One additive stats row for `docs` (sign = −1 for a delete batch). */
  private def appendStats(
      spark: SparkSession, dir: String, docs: DataFrame, sign: Long): Unit =
    docs.select(size(split(col("text"), " ")).cast("long").as("dl"))
      .agg((count(lit(1)) * sign).as("n_docs"),
        (coalesce(sum("dl"), lit(0L)) * sign).as("sum_dl"))
      .coalesce(1).write.mode("append").parquet(s"$dir/stats")

  /** Incremental maintenance — add `docs` to the index without touching
    * existing data (the [[graft.similarity.Similarity.ivfPqAppendIndex]]
    * contract on the lexical leg): new postings land in the tail
    * (term-unclustered — they prune poorly until [[optimizeIndex]]
    * re-clusters them, the honest cost of shuffle-free ingest), the new
    * docstats rows in theirs, and one additive stats row keeps N/avgdl
    * exact. Blind to duplicate doc_ids by default, like the ANN append —
    * re-adding a doc requires deleting it first — unless
    * `dedupAgainstIndex` is set (see the inline note). */
  def appendIndex(
      spark: SparkSession,
      dir: String,
      docs: DataFrame,
      dedupAgainstIndex: Boolean = false): Unit = {
    // dedupAgainstIndex = true anti-joins incoming doc_ids against the
    // VISIBLE docstats (one bounded join of the new batch against a
    // (doc_id, dl) relation), making a re-ingested batch a no-op for
    // postings AND stats — the idempotence the streaming ingest sink
    // relies on (foreachBatch replays a batch after a failure)
    val pendingDel = graft.ops.Layout.pendingTombstoned(spark,
      s"$dir/docstats", "doc_id", docs)
    require(pendingDel == 0L,
      s"$pendingDel incoming doc_ids have PENDING tombstones - appending " +
        "them would be silently masked and dropped at the next compaction; " +
        "run consolidateIndex first (delete-then-re-add contract)")
    // clusteredTableIfAny: the dedup anti-join must also work on a
    // FRESH dir (the streaming sink's first micro-batch bootstraps the
    // index) where no docstats data exists yet
    val incoming0 =
      if (!dedupAgainstIndex) docs
      else graft.ops.Layout.clusteredTableIfAny(spark, s"$dir/docstats")
        .fold(docs)(vis =>
          docs.join(vis.select("doc_id"), Seq("doc_id"), "left_anti"))
    // SNAPSHOT before writing: the docstats write below lands on the
    // very relation the dedup anti-join READS, and Spark's insert
    // commit refreshes cached plans/file listings on the written path —
    // a persist()ed incoming is invalidated by its OWN docstats write
    // and re-evaluates the anti-join against the just-written rows,
    // silently deduping the batch against itself (stats row = 0).
    // localCheckpoint is an eager, lineage-free snapshot: evaluated
    // ONCE (also fixing the triple tokenize/join evaluation), immune
    // to the refresh, bounded by the ingest batch size. Fanned out
    // first when the batch is SERIAL: a streaming micro-batch arrives
    // as one file/partition and the snapshot would pin the tokenize
    // explode to one core (the ANN append's measured pathology). The
    // fan-out threshold is min(parallelism, 8), not parallelism
    // itself (r22): a batch already ≥ 8-way parallel gains nothing
    // from a full-batch shuffle at ingest (the r21 spread-width A/B —
    // returns flatten past 8), and the shuffle is the costlier half.
    val par = spark.sparkContext.defaultParallelism
    val fanout = math.min(par, 8)
    val incoming = (if (incoming0.rdd.getNumPartitions >= fanout) incoming0
      else incoming0.repartition(par)).localCheckpoint()
    // three independent appends over the one checkpointed snapshot —
    // disjoint target dirs, overlapped on driver threads (guide §2.6)
    graft.Par.run(
      () => postingsOf(incoming, None)
        .select(col("term"), col("doc_id"), col("dl"), col("tf"))
        .write.mode("append").parquet(s"$dir/postings/tail"),
      () => incoming.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("dl"))
        .write.mode("append").parquet(s"$dir/docstats/tail"),
      () => appendStats(spark, dir, incoming, sign = 1L))
  }

  /** Delete documents from the index by id — tombstones on BOTH
    * lifecycle relations (masked immediately by [[searchPersisted]],
    * applied physically at [[consolidateIndex]]) plus one NEGATIVE
    * stats row, so N/avgdl/df all reflect the visible corpus exactly:
    * a post-delete search is bit-identical to a rebuild without the
    * deleted docs (spec-pinned), with no rewrite. Repeat-safe: the
    * stats delta is computed against the VISIBLE docstats, so
    * re-deleting an already-deleted (or absent) id contributes zero.
    * Returns the number of visible documents deleted. */
  def deleteIndex(
      spark: SparkSession,
      dir: String,
      docIds: DataFrame): Long = {
    val victims = graft.ops.Layout
      .clusteredTable(spark, s"$dir/docstats")
      .join(docIds.select(col("doc_id").cast("long").as("doc_id"))
        .distinct(), Seq("doc_id"), "left_semi")
      .persist()
    val d = victims.agg(count(lit(1)), coalesce(sum("dl"), lit(0L)))
      .collect()(0)
    val (nDel, dlDel) = (d.getLong(0), d.getLong(1))
    if (nDel > 0L) {
      // both tombstone writes read the already-materialized victims
      // cache and land in disjoint dirs — overlapped (guide §2.6)
      graft.Par.run(
        () => graft.ops.Layout.tombstone(spark, s"$dir/postings", "doc_id",
          victims.select("doc_id")),
        () => graft.ops.Layout.tombstone(spark, s"$dir/docstats", "doc_id",
          victims.select("doc_id")))
      // the NEGATIVE stats row commits strictly AFTER the tombstones:
      // it is the order-sensitive half of the delete (a stats row with
      // no tombstones = deleted docs visible in postings yet excluded
      // from N/avgdl — silently wrong scores), so a tombstone-write
      // failure above leaves the index fully consistent (docs simply
      // not deleted). The row is a 1-row literal write — micro-cost.
      spark.range(1).select(lit(-nDel).as("n_docs"),
        lit(-dlDel).as("sum_dl"))
        .coalesce(1).write.mode("append").parquet(s"$dir/stats")
    }
    victims.unpersist()
    nDel
  }

  /** OPTIMIZE pass: re-cluster both tails into their next generations
    * (term order for postings, doc order for docstats) — the shared
    * [[graft.ops.Layout.clusteredOptimize]] lifecycle. Returns postings
    * rows compacted. */
  def optimizeIndex(
      spark: SparkSession,
      dir: String,
      numFiles: Int,
      maxGenerations: Int = 0,
      writerOptions: Map[String, String] = Map.empty): Long = {
    // the two relations' passes are independent (disjoint dirs, own
    // manifests) — overlapped on driver threads (guide §2.6)
    var n = 0L
    graft.Par.run(
      () => n = graft.ops.Layout.clusteredOptimize(spark, s"$dir/postings",
        numFiles, Seq("term", "doc_id"), maxGenerations, writerOptions),
      () => graft.ops.Layout.clusteredOptimize(spark, s"$dir/docstats",
        math.max(1, numFiles / 4), Seq("doc_id"), maxGenerations,
        writerOptions))
    n
  }

  /** The VISIBLE additive-stats files at `dir/stats`: directly-landed
    * parquet files (every maintenance op appends one — visible the
    * moment they exist) plus manifest-admitted staged fold files, minus
    * manifest-retired ones. The stats dir carries its own
    * [[graft.ops.TableManifest]] chain so the consolidate fold swaps
    * atomically — see [[consolidateIndex]]. */
  private def statsFiles(
      spark: SparkSession, dir: String): Seq[org.apache.hadoop.fs.Path] = {
    val statsPath = new org.apache.hadoop.fs.Path(s"$dir/stats")
    val fs = statsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(statsPath)) return Seq.empty
    val manifest = graft.ops.TableManifest.latest(fs, statsPath)
    val retired = manifest.map(_.xstat).getOrElse(Set.empty)
    val direct = fs.listStatus(statsPath).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet")
        && !retired.contains(st.getPath.getName))
      .map(_.getPath)
    val staged = manifest.map(_.stat).getOrElse(Seq.empty)
      .filterNot(retired.contains)
      .map(rel => new org.apache.hadoop.fs.Path(statsPath, rel))
      .filter(fs.exists(_))
    direct ++ staged
  }

  /** Physically reclaim stats files a previous fold retired, plus any
    * staged directory no longer referenced by the manifest (a crashed
    * uncommitted fold, or a fully-retired old stage). */
  private def purgeStats(spark: SparkSession, dir: String): Unit = {
    val statsPath = new org.apache.hadoop.fs.Path(s"$dir/stats")
    val fs = statsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(statsPath)) return
    graft.ops.TableManifest.latest(fs, statsPath).foreach { m =>
      m.xstat.foreach { rel =>
        fs.delete(new org.apache.hadoop.fs.Path(statsPath, rel), false)
      }
      val referencedDirs = m.stat.filterNot(m.xstat.contains)
        .map(_.split("/").head).toSet
      fs.listStatus(statsPath).foreach { st =>
        if (st.isDirectory && st.getPath.getName.startsWith("staged-")
          && !referencedDirs.contains(st.getPath.getName))
          fs.delete(st.getPath, true)
      }
    }
  }

  /** CONSOLIDATE pass: fold all generations of both relations, applying
    * tombstones physically and retiring them — after this no data file
    * holds a deleted doc and reads pay no anti-join. Also COMPACTS the
    * additive stats relation to a single row: every maintenance op
    * (write/append/delete) appends one small stats file, so a
    * long-lived index would otherwise pay an ever-growing file listing
    * on every search; the fold is sum-preserving by construction
    * (integer sums), snapshot-pinned like the tombstone retirement so a
    * stats row landing mid-pass is neither folded nor retired.
    *
    * Fold atomicity (r19, closing the r18 double-count window): the
    * folded row is written to an UNREFERENCED staged subdirectory —
    * invisible to [[statsFiles]] — and ONE manifest commit then admits
    * it and retires the originals in the same atomic rename. A crash
    * before the commit leaves the visible set untouched (the orphan
    * stage is reclaimed next pass); there is no instant at which a
    * reader can see both the fold and its inputs. Retired files stay on
    * disk one maintenance interval for in-flight readers, like every
    * other lifecycle retirement ([[graft.ops.TableManifest]]).
    * Returns postings rows rewritten. */
  def consolidateIndex(
      spark: SparkSession,
      dir: String,
      numFiles: Int,
      writerOptions: Map[String, String] = Map.empty): Long = {
    // the two relations consolidate independently (disjoint dirs, own
    // manifests) — overlapped on driver threads (guide §2.6)
    var n = 0L
    graft.Par.run(
      () => n = graft.ops.Layout.clusteredConsolidate(spark,
        s"$dir/postings", numFiles, Seq("term", "doc_id"), writerOptions),
      () => graft.ops.Layout.clusteredConsolidate(spark, s"$dir/docstats",
        math.max(1, numFiles / 4), Seq("doc_id"), writerOptions))
    val statsPath = new org.apache.hadoop.fs.Path(s"$dir/stats")
    val fs = statsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    purgeStats(spark, dir)
    val visible = statsFiles(spark, dir)
    if (visible.length > 1) {
      val manifest = graft.ops.TableManifest.latest(fs, statsPath)
      val stageSeq = manifest.map(_.seq + 1).getOrElse(0)
      val stageDir = new org.apache.hadoop.fs.Path(statsPath, s"staged-$stageSeq")
      // overwrite: a same-named stage can only be a crashed UNcommitted
      // fold — never referenced, safe to replace
      graft.ops.ParquetIO.read(spark, visible.map(_.toString))
        .agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl"))
        .coalesce(1).write.mode("overwrite").parquet(stageDir.toString)
      val stagedRel = fs.listStatus(stageDir).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(st => s"staged-$stageSeq/${st.getPath.getName}")
      val visibleRel = visible.map { p =>
        if (p.getParent.getName.startsWith("staged-"))
          s"${p.getParent.getName}/${p.getName}"
        else p.getName
      }
      graft.ops.TableManifest.commit(fs, statsPath,
        graft.ops.TableManifest.Snapshot(
          0, None, Set.empty, Set.empty,
          stagedRel,
          manifest.map(_.xstat).getOrElse(Set.empty) ++ visibleRel))
    }
    n
  }

  /** Immediately reclaim everything the index's manifests have retired
    * (old generations, applied tombstones, folded stats files) instead
    * of waiting for the next maintenance pass — trades the in-flight-
    * reader grace window for disk space, like
    * [[graft.ops.Layout.vacuum]], and like it guarded: an unforced
    * call is a no-op while the newest manifest of a relation is
    * younger than the retention window (its retired files may still
    * have in-flight readers); pass `force = true` to reclaim now. */
  def vacuumIndex(
      spark: SparkSession, dir: String, force: Boolean = false): Long = {
    val n = graft.ops.Layout.vacuum(spark, s"$dir/postings", force = force) +
      graft.ops.Layout.vacuum(spark, s"$dir/docstats", force = force)
    val statsPath = new org.apache.hadoop.fs.Path(s"$dir/stats")
    val statsFs = statsPath.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val statsYoung = !force && graft.ops.TableManifest
      .ageMs(statsFs, statsPath)
      .exists(_ < graft.ops.Layout.DefaultVacuumRetentionMs)
    if (!statsYoung) purgeStats(spark, dir)
    n
  }

  /** UPSERT: replace-or-insert `docs` by doc_id — the operation the
    * loud [[appendIndex]] pending-tombstone require converts from
    * silent loss to a contract, made SUPPORTED: visible copies of the
    * incoming ids are tombstoned, the tombstones are applied physically
    * and retired (optimize folds any live tail so consolidate's
    * retirement condition holds, then consolidate rewrites), and the
    * new rows append — after which a search is bit-identical to an
    * index over the corpus with those docs replaced (spec-pinned; the
    * additive stats subtract the old rows and add the new, so N/avgdl
    * stay exact through the swap).
    *
    * Cost honesty: a batch that actually replaces documents pays ONE
    * full-index consolidate (the physical rewrite no tombstone design
    * avoids) — batch upserts accordingly; a batch of purely-new ids
    * skips the rewrite entirely (delete finds no victims, the append
    * is the normal shuffle-free tail write). Single-maintenance-writer
    * contract applies (this call runs maintenance passes). */
  def upsertIndex(
      spark: SparkSession,
      dir: String,
      docs: DataFrame,
      numFiles: Int,
      writerOptions: Map[String, String] = Map.empty): Unit = {
    // deleteIndex already counted the visible victims it tombstoned —
    // re-scanning the tombstone relation (pendingTombstoned) is only
    // needed when THIS batch deleted nothing but an EARLIER delete left
    // one of its ids pending (the short-circuit keeps that edge exact)
    val nDel = deleteIndex(spark, dir, docs.select("doc_id"))
    if (nDel > 0L || graft.ops.Layout.pendingTombstoned(spark,
      s"$dir/docstats", "doc_id", docs) > 0L) {
      optimizeIndex(spark, dir, numFiles, writerOptions = writerOptions)
      consolidateIndex(spark, dir, numFiles, writerOptions)
    }
    appendIndex(spark, dir, docs)
  }

  /** [[search]] served from a persisted index — identical output (the
    * scoring tail is the same code over the same relations; gate
    * q_bm25_persisted shares q_bm25's oracle verbatim), but the corpus
    * is never read: the postings scan is pruned to the query terms
    * (an IN chunked to the session's parquet pushdown threshold, each
    * chunk a contiguous slice of the sorted term list so row-group
    * min/max stats on the clustering key drop everything else), and
    * N/avgdl are a sum over the metadata-sized additive stats rows. */
  def searchPersisted(
      spark: SparkSession,
      dir: String,
      queries: Seq[(Int, String)],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 10): DataFrame = {
    val qterms = queryTerms(spark, queries)
    val termList = queries.flatMap(_._2.split(" ")).distinct.sorted
    require(termList.nonEmpty, "searchPersisted needs at least one term")
    val tf = graft.ops.Layout.chunkedIn(spark,
      graft.ops.Layout.clusteredTable(spark, s"$dir/postings"),
      "term", termList)
    // additive stats summed EAGERLY (one metadata-sized driver read) so
    // an all-deleted index fails LOUDLY here instead of silently
    // null-scoring downstream: net n_docs = 0 makes avgdl a NaN and idf
    // a null, and unlike the other lifecycle misuse paths nothing else
    // would raise. The literal single-row relation is bit-identical to
    // the lazy aggregate it replaces (same longs, same IEEE division).
    // memoized per (dir, lifecycle fingerprint): a serving workload
    // re-querying one index pays a directory listing, not a Spark job,
    // per batch; any append/delete/consolidate changes the file set
    // and reloads ([[graft.ops.ServingCache]])
    val (nSum, dlSum) = graft.ops.ServingCache
      .cached("bm25stats", spark, s"$dir/stats") {
        val statFileList = statsFiles(spark, dir)
        require(statFileList.nonEmpty, s"no stats relation at $dir/stats" +
          " - is this a writeIndex-built BM25 index directory?")
        val r = graft.ops.ParquetIO.read(spark, statFileList.map(_.toString))
          .agg(coalesce(sum("n_docs"), lit(0L)),
            coalesce(sum("sum_dl"), lit(0L)))
          .collect()(0)
        (r.getLong(0), r.getLong(1))
      }
    require(nSum > 0L,
      s"BM25 index at $dir has net n_docs=$nSum - every document has " +
        "been deleted (or the stats relation is inconsistent); idf/avgdl " +
        "are undefined over an empty corpus (delete-lifecycle contract)")
    // stats are driver-resolved longs here, so they attach as LITERAL
    // columns: bit-identical to the single-row-relation crossJoin they
    // replace (same doubles, same IEEE division), two broadcast
    // exchanges fewer in every serve plan
    val nLit = lit(nSum.toDouble)
    val avgdlLit = lit(dlSum.toDouble / nSum.toDouble)
    scoreAndRank(tf,
      (df, c) => df.withColumn(c, if (c == "n") nLit else avgdlLit),
      qterms, k1, b, topK)
  }
}
