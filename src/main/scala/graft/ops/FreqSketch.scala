package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.PortableHashExpr.portableHash

/** Relational count-min sketch (M76, Cormode & Muthukrishnan 2005) — the
  * mergeable FREQUENCY summary, complementing M57's Misra–Gries top-k
  * (which keeps only the heavy keys) and M64's HLL (which counts
  * distincts, not frequencies): approximate `count(key = k)` for ANY key
  * and approximate join sizes, answered from a depth×width counter grid
  * instead of the corpus.
  *
  * The sketch here is a plain RELATION `(r, c, n)` — row r of depth
  * hashes, counter column c, count n — not an opaque binary:
  *
  *   - building it is one `groupBy(r, c).count()` over a depth-×
  *     exploded corpus, and partial aggregation collapses each input
  *     partition to ≤ depth·width rows map-side, so the shuffle moves
  *     sketch-sized data no matter the corpus size;
  *   - merging sketches is ADDITION (`groupBy(r, c).sum(n)`) — counters
  *     are linear, so per-shard sketches summed equal the whole-corpus
  *     sketch EXACTLY, row for row (the mergeability contract, pinned by
  *     the spec rather than certified approximately);
  *   - every estimate is integer arithmetic on that table, which a SQL
  *     oracle replays bit-for-bit — the hash is the engine's portable
  *     31-base string hash, already rendered in DuckDB by every dedup
  *     gate.
  *
  * Guarantees (classic CMS): point estimates never undercount, and
  * overshoot ≤ e/width · N with probability 1 − (1/e)^depth; the
  * inner-product join-size estimate likewise never undercounts. Both
  * one-sided bounds are deterministic facts of the built table and are
  * REQUIREd at scale (ScaleBench), not assumed.
  *
  * No reference analogue; LLM-pipeline surface (SURVEY §2 M76) — the
  * 100 TB uses: "how often does this token/url/key occur" without a
  * corpus group-by, and "how big would this join be" (CMS inner product)
  * before paying for the join.
  */
object FreqSketch {

  /** Depth×width CMS over `keyCol` as a (r, c, n) relation
    * (≤ depth·width rows). Keys hash as strings through the engine's
    * portable hash, salted per row r. NULL keys are ignored — the same
    * semantics as SQL `count(key)` / `hll_sketch_agg` — and
    * [[graft.streaming.StreamingOps.frequencyStream]] filters
    * identically, preserving the bit-for-bit stream ≡ batch contract. */
  def cmsBuild(
      df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad CMS shape ${depth}x$width")
    df.select(col(keyCol).cast("string").as("_k"))
      .where(col("_k").isNotNull)
      .select(explode(sequence(lit(0), lit(depth - 1))).as("r"), col("_k"))
      .select(col("r"),
        pmod(portableHash(concat_ws(":", col("r"), col("_k"))),
          lit(width.toLong)).as("c"))
      .groupBy("r", "c")
      .agg(count(lit(1)).as("n"))
  }

  /** Sum per-shard sketches into one — exact, because counters are
    * linear. All inputs must share (depth, width). */
  def cmsMerge(sketches: Seq[DataFrame]): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("r", "c").agg(sum("n").as("n"))

  /** Point-frequency estimates for `keys` (a one-column DataFrame):
    * est(k) = min over rows r of the counter k hashes to (0 if the cell
    * is absent — CMS never undercounts, so absent means count 0).
    * `keys` is a query set (metadata-sized, broadcast); the sketch is at
    * most depth·width rows. Output: (key, est_n). */
  def cmsEstimate(
      sketch: DataFrame, keys: DataFrame, depth: Int, width: Int): DataFrame = {
    val probes = keys
      .select(keys.columns.head, keys.columns.tail: _*)
      .withColumnRenamed(keys.columns.head, "key")
      .select(col("key").cast("string").as("key"))
      .select(col("key"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("c",
        pmod(portableHash(concat_ws(":", col("r"), col("key"))),
          lit(width.toLong)))
    broadcast(probes).join(sketch, Seq("r", "c"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("n"), lit(0L))).as("est_n"))
  }

  /** CMS inner-product join-size estimate: |A ⨝_key B| ≈ min over rows r
    * of Σ_c nA(r,c)·nB(r,c). Never undercounts the true Σ_k a(k)·b(k).
    * Runs entirely on the two sketch relations (inner join on (r, c) —
    * absent cells are zero and contribute nothing to a row's dot
    * product; a row with NO overlapping cells has dot 0, kept via the
    * depth-row spine so the min can correctly report 0 for disjoint
    * key sets). One row out. */
  def cmsJoinSize(a: DataFrame, b: DataFrame, depth: Int): DataFrame = {
    val spark = a.sparkSession
    val spine = spark.createDataFrame(
      Seq.tabulate(depth)(Tuple1(_))).toDF("r")
    val dots = a.withColumnRenamed("n", "na")
      .join(b.withColumnRenamed("n", "nb"), Seq("r", "c"))
      .groupBy("r").agg(sum(col("na") * col("nb")).as("dot"))
    broadcast(spine).join(dots, Seq("r"), "left")
      .agg(min(coalesce(col("dot"), lit(0L))).as("est_join_size"))
  }
}
