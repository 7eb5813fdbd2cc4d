package graft

import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(rows).toDF("doc_id", "text")

  test("cardinalityReport: merge-consistent and exact at sketch-sparse scale") {
    // 3 groups × overlapping small key sets: HLL stays in sparse mode,
    // so the estimate is exact AND the sharded-merged estimate must
    // equal the whole-corpus estimate bit-for-bit (register-max union)
    val ev = spark.range(3000L).select(
      concat(lit("t"), col("id") % 3).as("event_type"),
      (col("id") % 157).as("user_id"))
    val out = graft.ops.Sketches.cardinalityReport(
      ev, "event_type", "user_id", shards = 8, lgK = 14)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(out.size == 3)
    // 3000 ids mod 3 × mod 157: each type sees ids ≡ t (mod 3) → users
    // {id % 157 : id ≡ t mod 3, id < 3000}; gcd(3,157)=1 → all 157
    out.foreach { case (_, (exact, consistent, within)) =>
      assert(exact == 157L)
      assert(consistent)
      assert(within)
    }
  }

  test("shardSketches + mergedEstimate: union over shards equals direct sketch") {
    val ev = spark.range(10000L).select(
      lit("g").as("grp"),
      (col("id") % 4).as("shard"),
      concat(lit("k"), col("id") % 1234).as("key"))
    val merged = graft.ops.Sketches.mergedEstimate(
      graft.ops.Sketches.shardSketches(ev, "grp", "shard", "key", lgK = 12),
      "grp").collect()(0).getLong(1)
    val direct = ev.agg(
      hll_sketch_estimate(hll_sketch_agg(col("key"), lit(12))))
      .collect()(0).getLong(0)
    assert(merged == direct) // exactly: register-wise max is associative
    assert(math.abs(merged - 1234L) <= 0.05 * 1234.0)
  }

  test("releaseManifest: counts, ranges and additive checksum per shard") {
    val d = docs((1L, "a b c"), (2L, "d e"), (3L, "a b c"), (4L, "xyz w"))
    val out = graft.ops.CorpusStats.releaseManifest(d, shards = 2)
    val byShard = out.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).toMap
    def h(s: String): Long = {
      var v = 0L; s.foreach(c => v = (v * 31 + c) % 1000000007L); v
    }
    // docs 1 and 3 share text → same hash → same shard; totals add up
    val expected = Seq((1L, "a b c"), (2L, "d e"), (3L, "a b c"), (4L, "xyz w"))
      .groupBy { case (_, t) => h(t) % 2 }
      .map { case (shard, rows) =>
        shard -> (
          rows.size.toLong,
          rows.map(_._2.split(" ").length.toLong).sum,
          rows.map(_._2.length.toLong).sum,
          rows.map(r => h(r._2)).sum,
          rows.map(_._1).min,
          rows.map(_._1).max)
      }
    assert(byShard == expected)
    // order-independence: reversed input yields the identical manifest
    val rev = graft.ops.CorpusStats.releaseManifest(
      d.orderBy(col("doc_id").desc).coalesce(1), shards = 2)
    assert(collectSet(rev) == collectSet(out))
  }

  // --- M71 theta-sketch set operations ---------------------------------

  private def keyed(rows: (String, String)*) =
    spark.createDataFrame(rows).toDF("split", "k")

  test("thetaSetReport: exact union/intersection/difference in the exact regime") {
    // A = {a,b,c,d}, B = {c,d,e}, C = {x}
    val df = keyed(
      ("A", "a"), ("A", "b"), ("A", "c"), ("A", "d"), ("A", "a"),
      ("B", "c"), ("B", "d"), ("B", "e"),
      ("C", "x"))
    val out = graft.ops.Sketches.thetaSetReport(df, "split", "k", lgK = 14)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(out(("A", "B")) == ((5L, 2L, 2L, false)))
    assert(out(("A", "C")) == ((5L, 0L, 4L, false)))
    assert(out(("B", "C")) == ((4L, 0L, 3L, false)))
    assert(out.size == 3)
  }

  test("thetaSplitSketches: estimate is partitioning-independent (union of partials)") {
    val df = spark.range(5000L).select(
      concat(lit("s"), col("id") % 2).as("split"),
      concat(lit("k"), col("id") % 997).as("k"))
    def est(parts: Int): Map[String, Long] = {
      import org.apache.datasketches.theta.{Sketches => TS}
      import org.apache.datasketches.memory.Memory
      graft.ops.Sketches.thetaSplitSketches(
        df.repartition(parts), "split", "k", lgK = 14)
        .collect().map(r => r.getString(0) ->
          Math.round(TS.wrapSketch(Memory.wrap(r.getAs[Array[Byte]](1)))
            .getEstimate)).toMap
    }
    val one = est(1)
    assert(est(7) == one && est(13) == one)
    assert(one.values.forall(_ == 997L)) // exact regime: true count
  }

  test("thetaSetReport: estimation regime is flagged and error-bounded") {
    // lgK 5 (nominal 32 entries) against 3000/2000 distinct keys forces
    // estimation mode; RSE ≈ 1/√32 ≈ 0.18 — assert a 4σ envelope
    val df = spark.range(6000L).select(
      concat(lit("s"), col("id") % 2).as("split"),
      concat(lit("k"), when(col("id") % 2 === 0, col("id"))
        .otherwise(col("id") % 4000)).as("k"))
    val r = graft.ops.Sketches.thetaSetReport(df, "split", "k", lgK = 5)
      .collect()(0)
    assert(r.getBoolean(5)) // estimation_mode
    val exactUnion = df.select("k").distinct().count()
    assert(math.abs(r.getLong(2) - exactUnion) <= 4 * 0.18 * exactUnion)
  }
}
