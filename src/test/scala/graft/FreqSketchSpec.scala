package graft

import org.apache.spark.sql.functions._
import graft.ops.FreqSketch

class FreqSketchSpec extends SparkSpec {

  // 100 keys with frequencies 1..100 (key k appears k+1 times)
  private def corpus = spark.range(5050L).select(
    floor((sqrt(col("id") * 8 + 1) - 1) / 2).cast("long").as("k"))

  // zipf-ish deterministic corpus: key = id % 97, plus a heavy key 1000
  private def skewed = spark.range(4000L).select(
    when(col("id") < 2000L, lit(1000L)).otherwise(col("id") % 97).as("k"))

  test("point estimates never undercount; exact when width is collision-free") {
    val df = skewed
    val sk = FreqSketch.cmsBuild(df, "k", depth = 4, width = 4096)
    val est = FreqSketch.cmsEstimate(sk, df.select("k").distinct(), 4, 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = df.groupBy(col("k").cast("string").as("key")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS undercounted key $k: ${est(k)} < $n") }
    // 98 keys in 4 independent 4096-cell rows: verify this fixture is
    // actually collision-free in at least one row, then est == exact
    val cells = sk.groupBy("r").agg(countDistinct("c").as("d")).collect()
      .map(r => r.getLong(1))
    assert(cells.exists(_ == 98L), s"fixture collides in every row: $cells")
    exact.foreach { case (k, n) => assert(est(k) == n) }
  }

  test("narrow width overcounts but never undercounts") {
    val df = skewed
    val sk = FreqSketch.cmsBuild(df, "k", depth = 4, width = 8)
    val est = FreqSketch.cmsEstimate(sk, df.select("k").distinct(), 4, 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = df.groupBy(col("k").cast("string").as("key")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) => assert(est(k) >= n) }
    // with 98 keys in 8 cells SOME estimate must exceed its true count
    assert(exact.exists { case (k, n) => est(k) > n })
  }

  test("mergeability is exact: per-shard sketches summed == whole build") {
    val df = corpus.withColumn("shard", pmod(col("k"), lit(3L)))
    val whole = FreqSketch.cmsBuild(df, "k", 4, 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = FreqSketch.cmsMerge(
      (0 until 3).map(s =>
        FreqSketch.cmsBuild(df.where(col("shard") === s), "k", 4, 64)))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("join-size estimate: one-sided, and 0 for disjoint key sets") {
    val a = spark.range(1000L).select((col("id") % 50).as("k"))
    val b = spark.range(600L).select((col("id") % 30).as("k"))
    val exact = a.groupBy("k").count().withColumnRenamed("count", "na")
      .join(b.groupBy("k").count().withColumnRenamed("count", "nb"), "k")
      .agg(sum(col("na") * col("nb"))).collect()(0).getLong(0)
    val est = FreqSketch.cmsJoinSize(
      FreqSketch.cmsBuild(a, "k", 4, 512),
      FreqSketch.cmsBuild(b, "k", 4, 512), depth = 4)
      .collect()(0).getLong(0)
    assert(est >= exact, s"join-size undercount: $est < $exact")

    val disjoint = spark.range(600L).select((col("id") % 30 + 10000L).as("k"))
    val estD = FreqSketch.cmsJoinSize(
      FreqSketch.cmsBuild(a, "k", 4, 512),
      FreqSketch.cmsBuild(disjoint, "k", 4, 512), depth = 4)
      .collect()(0).getLong(0)
    // width 512 »  distinct keys, so no cross-collisions: the spine
    // keeps empty rows and the min reports exactly 0
    assert(estD == 0L, s"disjoint join-size estimate $estD != 0")
  }

  test("null keys are ignored — SQL count(key) semantics") {
    val df = spark.createDataFrame(Seq(
      (1L, "a"), (2L, null), (3L, "a"), (4L, null), (5L, "b")))
      .toDF("id", "k")
    val sk = FreqSketch.cmsBuild(df, "k", depth = 2, width = 16)
    // total mass = depth × 3 non-null rows; nulls neither count nor
    // hash to "0"
    assert(sk.agg(sum("n")).collect()(0).getLong(0) == 6L)
    val onlyNonNull = FreqSketch.cmsBuild(
      df.where(col("k").isNotNull), "k", 2, 16)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val withNulls = sk
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(withNulls == onlyNonNull)
  }

  test("plan: build is one map-side-combined aggregate — no window, no join") {
    val plan = FreqSketch.cmsBuild(corpus, "k", 4, 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Join"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }
}
