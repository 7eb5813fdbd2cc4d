package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M13 — per-group corpus length distributions, in two variants:
  *
  *  - [[exact]]: Spark's exact `percentile` (shares DuckDB
  *    `quantile_cont`'s linear-interpolation definition, so the gate
  *    hash-matches even interpolated values). Exact percentiles hold
  *    the full value multiset per group — fine at gate scale, the
  *    WRONG choice at 100 TB.
  *  - [[approx]]: `approx_percentile` (Spark's t-digest-style QDigest
  *    sketch) — bounded memory per group regardless of corpus size,
  *    mergeable map-side, rank error ≤ 1/accuracy. THE 100 TB path;
  *    the spec bounds its drift against [[exact]] on skewed data.
  */
object CorpusStats {

  private def aggs(valueCol: String, p50: org.apache.spark.sql.Column,
      p90: org.apache.spark.sql.Column) = Seq(
    count(lit(1)).as("n_docs"),
    min(valueCol).as("min_chars"),
    p50.as("p50_chars"),
    p90.as("p90_chars"),
    max(valueCol).as("max_chars"),
    sum(valueCol).as("total_chars"))

  /** Exact per-group distribution (gate variant). */
  def exact(docs: DataFrame, groupCol: String = "lang",
      valueCol: String = "n_chars"): DataFrame = {
    val a = aggs(valueCol,
      expr(s"percentile($valueCol, 0.5)"),
      expr(s"percentile($valueCol, 0.9)"))
    docs.groupBy(groupCol).agg(a.head, a.tail: _*)
  }

  /** Sketch-based distribution (scale variant); `accuracy` trades
    * memory for rank error exactly like the reference's pandas
    * `.quantile` → dask/approx swap would. */
  def approx(docs: DataFrame, groupCol: String = "lang",
      valueCol: String = "n_chars", accuracy: Int = 10000): DataFrame = {
    val a = aggs(valueCol,
      expr(s"approx_percentile($valueCol, 0.5, $accuracy)"),
      expr(s"approx_percentile($valueCol, 0.9, $accuracy)"))
    docs.groupBy(groupCol).agg(a.head, a.tail: _*)
  }
}
