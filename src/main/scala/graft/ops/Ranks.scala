package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed ordinal (dense-rank) assignment without a global window.
  *
  * `row_number() OVER (ORDER BY id)` moves the whole table through ONE
  * reducer — the classic scale-killer. The standard fix is the
  * two-level rank: range-bucket the ids, count per bucket, prefix-sum
  * the BUCKET counts (a window over `buckets` rows, never the data),
  * then rank within each bucket and add its offset. Every shuffle is
  * keyed by bucket (corpus/buckets rows per partition), so the plan
  * scales with executors instead of serializing through one.
  */
object Ranks {

  /** Append `ordCol` = 0-based ordinal of `idCol` in ascending order.
    * `idCol` must be non-negative and unique (ids, not arbitrary data).
    * `buckets` bounds the per-window partition at ~n/buckets rows. */
  def denseOrdinals(
      df: DataFrame,
      idCol: String,
      ordCol: String,
      buckets: Int = 4096): DataFrame = {
    // equi-width range buckets over [0, max]: preserves id order across
    // buckets, so bucket-offset + within-bucket rank is the global rank.
    // Bucket by id div width — dividing FIRST cannot overflow, where
    // id * buckets silently wraps for ids above 2^63/buckets. The width
    // ceil((max+1)/buckets) is computed as (max div buckets) + 1
    // (identical for every max ≥ 0), which cannot overflow either —
    // the full Long id range is safe.
    val stats = df.agg(max(col(idCol)).cast("long").as("_mx"))
    val withB = df.crossJoin(broadcast(stats))
      .withColumn("_w", expr(s"(_mx div $buckets) + 1"))
      .withColumn("_b",
        least(expr(s"cast($idCol as bigint) div _w"),
          lit(buckets - 1).cast("long")))
    val counts = withB.groupBy("_b").agg(count(lit(1)).as("_c"))
    // prefix sum over bucket COUNTS: `buckets` rows total — a bounded
    // single-partition window (the SCALE.md bounded-cardinality rule),
    // not a data-sized one
    val offsets = counts.select(col("_b"),
      (sum("_c").over(Window.partitionBy(lit(0)).orderBy("_b"))
        - col("_c")).as("_off"))
    withB.join(broadcast(offsets), "_b")
      .withColumn(ordCol,
        row_number().over(Window.partitionBy("_b").orderBy(idCol))
          - 1 + col("_off"))
      .drop("_b", "_w", "_mx", "_c", "_off")
  }
}
