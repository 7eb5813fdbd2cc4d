package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucket-decomposed interval join (M75) — points matched to the
  * intervals that contain them, with BOTH sides at data scale.
  *
  * Spark's native plan for `p JOIN i ON p.v BETWEEN i.lo AND i.hi` is a
  * BroadcastNestedLoopJoin (fine while one side is metadata-sized) or a
  * cartesian product — the classic 100 TB killer: O(|P|·|I|) comparisons
  * and one side fully materialized per task. The standard fix (the
  * Databricks range-join "bin" hint, Flink's interval join, the
  * DBMS-textbook grid decomposition) is to EQUI-JOIN on a bucketization
  * of the value domain:
  *
  *   - each interval [lo, hi] replicates to every width-`w` bucket it
  *     touches (`floorDiv(lo,w) .. floorDiv(hi,w)` — cost |I|·(span/w+1));
  *   - each point lands in exactly ONE bucket (`floorDiv(v, w)`);
  *   - the join becomes `bucket == bucket AND lo <= v AND v <= hi` — a
  *     plain shuffled hash/sort-merge join Catalyst already knows how to
  *     partition, spill, and AQE-skew-split.
  *
  * A matching pair meets in exactly one bucket (the point's), so the
  * output carries NO duplicates and needs no post-dedup — the
  * decomposition is lossless and exact, not approximate.
  *
  * Picking `width`: buckets ≈ interval span makes the replication factor
  * ~2 while keeping each bucket's candidate set tight; a width 10× the
  * span wastes candidate comparisons, a width span/10 replicates each
  * interval 10×. Skewed bucket populations (a hot hour, a hot key range)
  * are AQE skew-join territory — the join is a standard Exchange-backed
  * equi-join precisely so that machinery applies.
  *
  * All bucket arithmetic is exact BIGINT: `floorDiv` is implemented as
  * `(a - pmod(a, w)) div w` (pmod's result is non-negative, the
  * numerator is exactly divisible, so truncating `div` IS floor) — no
  * doubles, so values anywhere in the long range bucket identically in
  * any engine.
  *
  * No reference analogue (emiproc joins rasters by cell id); this is
  * LLM-pipeline surface (SURVEY §2 M75) — the shape behind IP-range →
  * geo enrichment, event → maintenance/campaign-window attribution, and
  * coordinate → tile assignment when both sides are large.
  */
object IntervalJoin {

  /** Exact floor(a / w) for BIGINT `a` and positive literal `w`.
    *
    * Uses SQL integral `div` (IntegralDivide), NOT `Column./` — Spark's
    * `/` promotes BIGINT to DOUBLE, which is exact only for |a| < 2^53;
    * with full-range keys (e.g. xxhash64-derived ids) a point and an
    * interval endpoint could round into different buckets and silently
    * drop matching pairs. Truncating `div` is corrected to floor by
    * subtracting 1 when the remainder is negative (`%` takes the
    * dividend's sign). The correction form — NOT `div(a - pmod(a, w),
    * w)` — is deliberate: the subtraction there wraps for the w−1
    * values closest to Long.MinValue (pmod is non-negative, so
    * `a - pmod` underflows), bucketing them positive. Here `a % w`
    * and `div(a, w)` are overflow-free for every long when w > 0
    * (only `Long.MinValue div -1` overflows), so this is exact over
    * the FULL long range. */
  def floorDiv(a: Column, w: Long): Column = {
    require(w > 0, s"bucket width must be positive, got $w")
    call_function("div", a, lit(w)) -
      when(a % lit(w) < 0, lit(1L)).otherwise(lit(0L))
  }

  /** Join `points` to every row of `intervals` whose [loCol, hiCol]
    * (inclusive both ends) contains `pointCol`. All three columns must
    * be BIGINT-comparable. Output = all point columns + all interval
    * columns (names must not collide, like any natural join). */
  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      width: Long): DataFrame = {
    val iv = intervals.withColumn("_ij_bucket",
      explode(sequence(
        floorDiv(col(loCol), width), floorDiv(col(hiCol), width))))
    val pt = points.withColumn("_ij_bucket", floorDiv(col(pointCol), width))
    pt.join(iv,
        pt("_ij_bucket") === iv("_ij_bucket") &&
          col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_ij_bucket")
  }
}
