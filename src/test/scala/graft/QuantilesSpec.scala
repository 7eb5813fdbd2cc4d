package graft

import org.apache.spark.sql.functions._
import graft.ops.Quantiles

class QuantilesSpec extends SparkSpec {

  test("exact region: values below 2^sigBits give exact quantiles") {
    // values 1..31 each once, sigBits 5 → every bucket is the value
    val df = spark.range(1L, 32L).select(col("id").as("v"))
    val hist = Quantiles.hdrBuild(df, "v", sigBits = 5)
    val out = Quantiles.hdrQuantiles(hist, Seq(500000L, 1000000L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rank(p50) = ceil(31 * 0.5) = 16 → value 16; p100 → 31
    assert(out(500000L) == 16L)
    assert(out(1000000L) == 31L)
  }

  test("truncated region: answers are bucket lower bounds within 2^(1-s) relative error") {
    val s = 6
    val df = spark.range(1L, 100001L).select((col("id") * 997L).as("v"))
    val hist = Quantiles.hdrBuild(df, "v", sigBits = s)
    val qs = Seq(500000L, 900000L, 990000L)
    val got = Quantiles.hdrQuantiles(hist, qs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    qs.foreach { q =>
      val rank = math.ceil(100000.0 * q / 1000000.0).toLong
      val trueQ = rank * 997L // values are sorted multiples of 997
      val v = got(q)
      assert(v <= trueQ, s"q=$q: answer $v overshoots true $trueQ")
      // v is the lower bound of the bucket containing trueQ: width/v < 2^(1-s)
      assert(trueQ - v <= v * 2.0 / (1L << (s - 1)),
        s"q=$q: answer $v misses relative-error bound vs $trueQ")
    }
  }

  test("negative values are rejected loudly, not silently mis-bucketed") {
    val df = spark.createDataFrame(
      Seq(Tuple1(5L), Tuple1(-3L))).toDF("v")
    val e = intercept[Exception] {
      Quantiles.hdrBuild(df, "v", sigBits = 5).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("negative value")), e.toString)
  }

  test("bucket count stays metadata-sized and counts conserve") {
    val df = spark.range(1000000L).select((col("id") * 31 + 1).as("v"))
    val hist = Quantiles.hdrBuild(df, "v", sigBits = 7).persist()
    val nBuckets = hist.count()
    // ≤ 64 exponents × 2^(sigBits-1) sub-buckets
    assert(nBuckets <= 64L * 64L, s"$nBuckets buckets")
    assert(hist.agg(sum("n")).collect()(0).getLong(0) == 1000000L)
    hist.unpersist()
  }

  test("merge is exact: per-shard histograms summed == whole build") {
    val df = spark.range(50000L)
      .select((col("id") % 12345 + 1).as("v"), pmod(col("id"), lit(4L)).as("shard"))
    val whole = Quantiles.hdrBuild(df, "v", 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = Quantiles.hdrMerge(
      (0 until 4).map(s0 =>
        Quantiles.hdrBuild(df.where(col("shard") === s0), "v", 6)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == whole)
  }

  test("grouped quantiles: per-group windows, independent answers") {
    val df = spark.range(2000L).select(
      concat(lit("g"), col("id") % 2).as("g"),
      when(col("id") % 2 === 0, col("id") + 1).otherwise(col("id") * 100 + 1)
        .as("v"))
    val hist = Quantiles.hdrBuild(df, "v", 8, groupCols = Seq("g"))
    val out = Quantiles.hdrQuantiles(hist, Seq(500000L), groupCols = Seq("g"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // g0 values ≈ 1..1999 odd ids doubled... just assert ordering scale
    assert(out(("g0", 500000L)) < 2100L)
    assert(out(("g1", 500000L)) > 50000L)
  }
}
