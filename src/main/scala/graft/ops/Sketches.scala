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
}
