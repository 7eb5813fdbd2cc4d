package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches (Apache DataSketches HLL via the Spark
  * builtins `hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`) —
  * the incremental corpus-statistics pattern at 100 TB: build one small
  * binary sketch PER SHARD as data lands, keep the sketches (kilobytes
  * each), and answer "distinct users/urls/doc-ids so far" by merging
  * sketches — never by rescanning the corpus. A new shard's arrival
  * costs one shard-local aggregate plus a metadata-scale union.
  *
  * Why the merge is trustworthy: an HLL sketch's state is a register
  * array of per-slot maxima, so building per-shard sketches and unioning
  * them yields the SAME registers as sketching the whole corpus in one
  * pass — the estimate is exactly grouping- and order-independent (the
  * property [[cardinalityReport]] certifies and ScaleBench B29 REQUIREs
  * at 50M rows). The estimate itself is approximate with standard error
  * ≈ 1.04/√2^lgK (~1.6% at the default lgK = 12).
  *
  * Reference-side analogue: none (emiproc holds inventories in memory);
  * this is part of the LLM-pipeline surface (SURVEY §2 M64).
  */
object Sketches {

  /** Per-(group, shard) HLL sketches over `keyCol`. One map-side-combined
    * aggregate; output is #groups × #shards rows of ≤ ~2^lgK-byte
    * binaries — the artifact a 100 TB pipeline persists per ingest
    * batch. */
  def shardSketches(
      df: DataFrame,
      groupCol: String,
      shardCol: String,
      keyCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(col(groupCol), col(shardCol))
      .agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("sketch"))

  /** Merge per-shard sketches to per-group cardinality estimates — the
    * query a pipeline runs against STORED sketches instead of the
    * corpus. #sketch rows in, #groups rows out. */
  def mergedEstimate(sketches: DataFrame, groupCol: String): DataFrame =
    sketches.groupBy(col(groupCol))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
        .as("est_distinct"))

  /** Certification report for the sketch path, per group:
    *
    *   - `exact_distinct` — the ground truth (the one full shuffle a
    *     pipeline runs once to certify, then retires);
    *   - `merge_consistent` — sharded-then-merged estimate EQUALS the
    *     single-pass whole-corpus estimate (must be exactly true: HLL
    *     registers are per-slot maxima, so union is grouping-
    *     independent);
    *   - `within_bound` — |est − exact| ≤ relErr · exact.
    *
    * Shards are derived deterministically: `pmod(portableHash(key),
    * shards)` — content-stable, so re-runs certify the same partition.
    * A gate query pins both flags true against a DuckDB oracle that
    * computes `exact_distinct` and asserts the contract literals.
    *
    * Plan shape: the source is scanned twice (sharded-sketch path +
    * whole-corpus path) — inherent to certifying one against the
    * other, and this report runs ONCE per corpus; steady-state
    * pipelines run only [[shardSketches]]/[[mergedEstimate]], which
    * scan nothing after the sketches are stored. */
  def cardinalityReport(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      shards: Int = 8,
      lgK: Int = 12,
      relErr: Double = 0.05): DataFrame = {
    val keyed = df.select(
      col(groupCol),
      col(keyCol).cast("string").as("_key"),
      pmod(graft.functions.PortableHashExpr.portableHash(
        col(keyCol).cast("string")), lit(shards.toLong)).as("_shard"))
    val sharded = mergedEstimate(
      shardSketches(keyed, groupCol, "_shard", "_key", lgK), groupCol)
      .withColumnRenamed("est_distinct", "_est_merged")
    val whole = keyed.groupBy(col(groupCol))
      .agg(
        hll_sketch_estimate(hll_sketch_agg(col("_key"), lit(lgK)))
          .as("_est_whole"),
        countDistinct(col("_key")).as("exact_distinct"))
    whole.join(sharded, groupCol)
      .select(
        col(groupCol),
        col("exact_distinct"),
        (col("_est_merged") === col("_est_whole")).as("merge_consistent"),
        (abs(col("_est_merged") - col("exact_distinct")) <=
          lit(relErr) * col("exact_distinct")).as("within_bound"))
  }

  // --- Theta-sketch set operations (M71) --------------------------------
  //
  // HLL (M64) answers only |A| and |A ∪ B|; DataSketches THETA sketches
  // additionally support intersection and difference — the sketch that
  // answers "how many distinct keys do corpus splits SHARE" (train/eval
  // contamination, vocabulary overlap between subcorpora, snapshot churn)
  // without ever joining the corpora. M61's exact overlap matrix needs a
  // (split, key)-distinct shuffle plus a key join per refresh; the theta
  // path builds one kilobyte-scale sketch per split in a single pass,
  // then ALL #splits² set operations run on stored sketches — the
  // steady-state overlap monitor at 100 TB re-reads nothing.
  //
  // Exactness regime: a theta sketch retains every key hash until it
  // exceeds its nominal capacity 2^lgK, and while theta == 1 estimates
  // are EXACT counts — the gate regime (oracle computes the true
  // pairwise counts; `estimation_mode` is pinned false). Past capacity
  // the estimate carries RSE ≈ 1/√2^lgK; ScaleBench drives that regime
  // with an error-bound REQUIRE.

  /** Per-split compact theta sketches over `keyCol`, built in one pass:
    * each input partition keeps one update sketch per split it sees and
    * emits the compact form, then one #splits-group merge unions the
    * partials (a theta union keeps the k smallest key hashes, so the
    * result depends only on the KEY SET — grouping- and order-
    * independent, same property the HLL gate certifies). Output:
    * `(split, sketch)` — kilobytes per split, the persisted artifact. */
  def thetaSplitSketches(
      df: DataFrame,
      splitCol: String,
      keyCol: String,
      lgK: Int = 14): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.datasketches.theta.{SetOperation, UpdateSketch, Sketches => ThetaSketches}
    import org.apache.datasketches.memory.Memory
    val partials = df
      .select(col(splitCol).cast("string").as("split"),
        col(keyCol).cast("string").as("k"))
      .as[(String, String)]
      .mapPartitions { it =>
        val sketches = scala.collection.mutable.Map.empty[String, UpdateSketch]
        it.foreach { case (split, k) =>
          sketches.getOrElseUpdate(split,
            UpdateSketch.builder().setLogNominalEntries(lgK).build())
            .update(k)
        }
        sketches.iterator.map { case (split, sk) =>
          (split, sk.compact().toByteArray)
        }
      }
    partials
      .groupByKey(_._1)
      .mapGroups { (split, it) =>
        val union = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
        it.foreach { case (_, bytes) =>
          union.union(ThetaSketches.wrapSketch(Memory.wrap(bytes)))
        }
        (split, union.getResult.toByteArray)
      }
      .toDF("split", "sketch")
  }

  /** Pairwise set-operation report over the per-split sketches: for each
    * ordered split pair (a < b), the estimated distinct-key union,
    * intersection, and difference |A∖B|, plus `estimation_mode` (true
    * iff either operand left the exact regime — the flag a pipeline
    * alerts on before trusting tight contamination bounds). The pair
    * loop runs on COLLECTED sketches — #splits kilobyte rows, metadata
    * by construction (the corpus was touched once, in
    * [[thetaSplitSketches]]). */
  def thetaSetReport(
      df: DataFrame,
      splitCol: String,
      keyCol: String,
      lgK: Int = 14): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.datasketches.theta.{SetOperation, Sketches => ThetaSketches}
    import org.apache.datasketches.memory.Memory
    val merged = thetaSplitSketches(df, splitCol, keyCol, lgK)
      .as[(String, Array[Byte])].collect()
      .map { case (s, b) => (s, ThetaSketches.wrapSketch(Memory.wrap(b))) }
      .sortBy(_._1)
    val rows = for {
      i <- merged.indices
      j <- (i + 1) until merged.length
    } yield {
      val (sa, ska) = merged(i)
      val (sb, skb) = merged(j)
      val union = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
      union.union(ska); union.union(skb)
      val inter = SetOperation.builder().buildIntersection()
      inter.intersect(ska); inter.intersect(skb)
      val aNotB = SetOperation.builder().buildANotB().aNotB(ska, skb)
      (sa, sb,
        Math.round(union.getResult.getEstimate),
        Math.round(inter.getResult.getEstimate),
        Math.round(aNotB.getEstimate),
        ska.isEstimationMode || skb.isEstimationMode)
    }
    spark.createDataFrame(rows).toDF(
      "split_a", "split_b", "est_union", "est_intersect", "est_only_a",
      "estimation_mode")
  }
}
