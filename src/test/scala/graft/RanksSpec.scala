package graft

import org.apache.spark.sql.functions._

class RanksSpec extends SparkSpec {
  import spark.implicits._

  test("denseOrdinals matches a global sort rank on sparse, skewed ids") {
    // non-contiguous ids with heavy clustering at the low end
    val ids = (Seq(0L, 1L, 2L, 3L, 5L, 8L, 13L) ++
      (100L until 150L) ++ Seq(1000000L, 999999L, 123456L)).distinct
    val df = ids.toDF("doc_id")
    val out = graft.ops.Ranks.denseOrdinals(df, "doc_id", "ord", buckets = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = ids.sorted.zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    assert(out == expected)
  }

  test("denseOrdinals with more buckets than rows still covers 0..n-1") {
    val df = Seq(7L, 3L, 42L).toDF("doc_id")
    val out = graft.ops.Ranks.denseOrdinals(df, "doc_id", "ord", buckets = 4096)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(3L -> 0L, 7L -> 1L, 42L -> 2L))
  }

  test("denseOrdinals survives ids above 2^63/buckets (no multiply overflow)") {
    // id * 4096 wraps negative for ids > 2^51-ish under the old
    // multiply-first bucketing; divide-first must rank these correctly
    val huge = Seq(Long.MaxValue, Long.MaxValue - 1L, Long.MaxValue / 2, 3L,
      (1L << 60) + 17L, (1L << 52), 999L)
    val out = graft.ops.Ranks.denseOrdinals(huge.toDF("doc_id"), "doc_id", "ord")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = huge.sorted.zipWithIndex
      .map { case (id, i) => id -> i.toLong }.toMap
    assert(out == expected)
  }
}
