package graft

import org.apache.spark.sql.functions._
import graft.ops.IntervalJoin

class IntervalJoinSpec extends SparkSpec {

  // Deterministic mixed-sign fixture: points on a stride, intervals of
  // varying span (0 to ~7 buckets wide at width=10) at varying offsets.
  private def pts = spark.range(-200L, 200L)
    .select(col("id").as("p_id"), (col("id") * 3 - 7).as("v"))
  private def ivs = spark.range(-40L, 40L).select(
    col("id").as("i_id"),
    (col("id") * 13).as("lo"),
    (col("id") * 13 + pmod(col("id"), lit(70L))).as("hi"))

  private def bruteForce: Set[(Long, Long)] =
    pts.crossJoin(ivs)
      .where(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("p_id", "i_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact vs brute force — mixed signs, spans from 0 to multi-bucket") {
    val got = IntervalJoin.intervalJoin(pts, ivs, "v", "lo", "hi", width = 10L)
      .select("p_id", "i_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // no duplicates: each matching pair meets in exactly one bucket
    assert(got.length == got.toSet.size, "duplicate pairs emitted")
    assert(got.toSet == bruteForce)
    assert(got.nonEmpty)
  }

  test("boundary inclusivity: v == lo and v == hi both match") {
    val p = spark.createDataFrame(Seq(Tuple1(10L), Tuple1(20L), Tuple1(21L)))
      .toDF("v")
    val i = spark.createDataFrame(Seq((1L, 10L, 20L))).toDF("i_id", "lo", "hi")
    val got = IntervalJoin.intervalJoin(p, i, "v", "lo", "hi", 7L)
      .select("v").collect().map(_.getLong(0)).toSet
    assert(got == Set(10L, 20L))
  }

  test("floorDiv is floor, not truncation, for negatives") {
    val df = spark.createDataFrame(
      Seq(Tuple1(-7L), Tuple1(-3L), Tuple1(-1L), Tuple1(0L), Tuple1(7L)))
      .toDF("a")
    val got = df.select(IntervalJoin.floorDiv(col("a"), 3L)).collect()
      .map(_.getLong(0)).toSeq
    assert(got == Seq(-3L, -1L, -1L, 0L, 2L))
  }

  test("floorDiv is exact above 2^53 (where double division rounds)") {
    // 2^53 + 1 is the first long a double cannot represent; a
    // double-division floorDiv would bucket these off-by-one.
    val big = (1L << 53) + 1L
    // Long.MinValue .. MinValue+w-2 are the values where the previous
    // div(a - pmod(a, w), w) form WRAPPED (a - pmod underflows) and
    // bucketed them positive — keep them pinned here
    val vals = Seq(big, big + 9L, -big, Long.MaxValue, Long.MinValue + 10L,
      Long.MinValue, Long.MinValue + 1L, Long.MinValue + 8L)
    val df = spark.createDataFrame(vals.map(Tuple1(_))).toDF("a")
    val got = df.select(IntervalJoin.floorDiv(col("a"), 10L)).collect()
      .map(_.getLong(0)).toSeq
    val want = vals.map(v => Math.floorDiv(v, 10L))
    assert(got == want)
  }

  test("intervalJoin matches at full-long-range magnitudes") {
    val base = (1L << 53) + 5L
    val p = spark.createDataFrame(Seq(Tuple1(base), Tuple1(base + 3L)))
      .toDF("v")
    val i = spark.createDataFrame(Seq((1L, base - 1L, base + 1L)))
      .toDF("i_id", "lo", "hi")
    val got = IntervalJoin.intervalJoin(p, i, "v", "lo", "hi", 10L)
      .select("v").collect().map(_.getLong(0)).toSet
    assert(got == Set(base))
  }

  test("plan: equi-join on buckets — no nested-loop, no cartesian") {
    val plan = IntervalJoin
      .intervalJoin(pts, ivs, "v", "lo", "hi", width = 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
