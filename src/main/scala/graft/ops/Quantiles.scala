package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HDR-histogram quantile summary (M77, Gil Tene's HdrHistogram — the
  * latency-monitoring standard): mergeable, DETERMINISTIC percentiles
  * over non-negative BIGINT metrics (doc lengths, token counts, byte
  * sizes, latencies) with a guaranteed relative-error bound.
  *
  * Why not a randomized quantile sketch (KLL/t-digest): their compaction
  * draws random bits, so the persisted artifact differs run to run and
  * merge order matters — unacceptable for this engine's reproducibility
  * contract (every artifact re-derivable bit-for-bit). The HDR idea is a
  * FIXED bucketization: truncate each value to its top `sigBits`
  * significant bits. That keeps ≤ 2^(sigBits−1) buckets per power of
  * two (≤ ~64·2^(sigBits−1) total for the long range — metadata-sized),
  * gives every quantile answer relative error < 2^(1−sigBits), and makes
  * the histogram a plain additive relation:
  *
  *   - building = one `groupBy(bucket).count()` (map-side combined to
  *     ≤ #buckets rows per partition — sketch-sized shuffle);
  *   - merging shards = SUM (linear counters ⇒ sharded-then-merged
  *     equals whole-corpus exactly, spec-pinned);
  *   - quantile extraction = a cumulative window over the ≤ #buckets-row
  *     table (global window on METADATA-sized input, like Evaluation's —
  *     never the corpus).
  *
  * All arithmetic is integer (bit length via a 63-branch comparison
  * ladder, truncation via shifts, ranks via ceil-division on BIGINTs),
  * so a SQL oracle replays every row bit-for-bit — no float log2 whose
  * half-ulp rounding could drift between engines.
  *
  * No reference analogue; LLM-pipeline surface (SURVEY §2 M77) — the
  * per-shard length/score distribution artifact a 100 TB pipeline
  * persists next to its HLL (M64) and CMS (M76) summaries.
  */
object Quantiles {

  /** Exact bit length of a non-negative BIGINT as a comparison ladder —
    * codegen-friendly (63 long comparisons, no strings, no float log).
    * Folding ascending puts the LARGEST bit's `when` outermost, so the
    * first true condition from the top wins. */
  private def bitLength(v: Column): Column =
    (0 to 62).foldLeft(lit(0)) { (acc, b) =>
      when(v >= lit(1L << b), lit(b + 1)).otherwise(acc)
    }

  /** Histogram over `valueCol` (non-negative BIGINT), optionally per
    * `groupCols`: one row per (group, bucket) with the bucket lower
    * bound (the value truncated to its top `sigBits` significant bits —
    * values below 2^sigBits are exact) and count. ≤ ~64·2^(sigBits−1)
    * buckets per group. */
  def hdrBuild(
      df: DataFrame, valueCol: String, sigBits: Int,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(sigBits >= 1 && sigBits <= 62, s"bad sigBits $sigBits")
    df
      // Enforce the documented non-negative domain at execution time:
      // for v < 0 bitLength is 0, the shift clamps to 0, and every
      // distinct negative value would silently become its own bucket —
      // breaking the metadata-size bound. Fail loudly instead.
      .withColumn("_hdr_v",
        when(col(valueCol).cast("long") < 0,
          raise_error(concat(
            lit(s"hdrBuild: negative value in '$valueCol' — the HDR " +
              "domain is non-negative BIGINT: "),
            col(valueCol).cast("string"))).cast("long"))
          .otherwise(col(valueCol).cast("long")))
      .withColumn("_hdr_sh",
        greatest(bitLength(col("_hdr_v")) - lit(sigBits), lit(0)))
      // v truncated to its bucket's lower bound via shifts: the SQL
      // shiftright/shiftleft accept a column shift amount (the
      // DataFrame helpers take only literals).
      .withColumn("bucket",
        expr("shiftleft(shiftright(_hdr_v, _hdr_sh), _hdr_sh)"))
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Sum per-shard histograms — exact (linear counters). Inputs must
    * share sigBits and group columns. */
  def hdrMerge(hists: Seq[DataFrame], groupCols: Seq[String] = Nil): DataFrame =
    hists.reduce(_ unionByName _)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(sum("n").as("n"))

  /** Quantiles from a histogram: for each requested quantile q (in parts
    * per million, to keep the rank arithmetic BIGINT-exact), the bucket
    * lower bound whose cumulative count first reaches
    * rank = ceil(total·q / 1e6). Output: (groups..., q_ppm, value).
    * The windows run on the ≤ #buckets-row histogram — metadata-sized
    * by construction (the documented Evaluation-style exception to the
    * no-global-window rule when groupCols is empty). */
  def hdrQuantiles(
      hist: DataFrame, qsPpm: Seq[Long],
      groupCols: Seq[String] = Nil): DataFrame = {
    require(qsPpm.nonEmpty && qsPpm.forall(q => q > 0 && q <= 1000000L),
      s"quantiles must be in (0, 1e6] ppm: $qsPpm")
    val spark = hist.sparkSession
    val base = if (groupCols.isEmpty) Window.orderBy("bucket")
      else Window.partitionBy(groupCols.map(col): _*).orderBy("bucket")
    val cum = hist
      .withColumn("cum", sum("n").over(
        base.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum("n").over(
        base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val qs = spark.createDataFrame(qsPpm.map(Tuple1(_))).toDF("q_ppm")
    cum.join(broadcast(qs),
        col("cum") * lit(1000000L) >= col("q_ppm") * col("total"))
      .groupBy((groupCols.map(col) :+ col("q_ppm")): _*)
      .agg(min("bucket").as("value"))
  }
}
