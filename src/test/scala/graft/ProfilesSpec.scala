package graft

import org.apache.spark.sql.functions._
import graft.profiles.{Profiles, VerticalProfiles, WeightedVectorMerge}

class ProfilesSpec extends SparkSpec {

  test("normalize makes each profile sum to 1") {
    val p = spark.createDataFrame(Seq(
      (1, 0, 2.0), (1, 1, 6.0), (2, 0, 5.0), (2, 1, 5.0), (2, 2, 10.0)))
      .toDF("profile_id", "pos", "w")
    val out = Profiles.normalize(p)
    val sums = out.groupBy("profile_id").sum("ratio").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(sums.values.forall(s => math.abs(s - 1.0) < 1e-12))
    val r10 = out.where(col("profile_id") === 1 && col("pos") === 0)
      .collect()(0).getDouble(2)
    assert(r10 == 0.25)
  }

  test("combineWeighted is the emission-weighted average, renormalized") {
    // group g: member m1 (weight 1) ratios (1, 0); member m2 (weight 3) ratios (0, 1)
    val w = spark.createDataFrame(Seq(("g", "m1", 1.0), ("g", "m2", 3.0)))
      .toDF("group", "member", "weight")
    val p = spark.createDataFrame(Seq(
      ("m1", 0, 1.0), ("m1", 1, 0.0), ("m2", 0, 0.0), ("m2", 1, 1.0)))
      .toDF("member", "pos", "w")
    val out = Profiles.combineWeighted(w, p).collect()
      .map(r => r.getInt(1) -> r.getDouble(2)).toMap
    assert(out == Map(0 -> 0.25, 1 -> 0.75))
  }

  test("dedupVectors groups identical vectors under one dense id") {
    val p = spark.createDataFrame(Seq(
      (1, 0, 5L), (1, 1, 7L),
      (2, 0, 5L), (2, 1, 7L), // identical to 1
      (3, 0, 9L)))
      .toDF("profile_id", "pos", "qw")
    val out = Profiles.dedupVectors(p).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out(1) == out(2))
    assert(out(1) != out(3))
    assert(Set(out(1), out(3)) == Set(1L, 2L)) // dense 1-based ids
    assert(Profiles.dedupVectors(p).columns.toSeq == Seq("profile_id", "dedup_id"))
  }

  test("dedupVectors: driver small path and distributed rank path agree") {
    // 120 profiles over 17 distinct vectors — driverVecLimit = 0 forces
    // the range-partitioned two-phase rank; default takes the driver
    // sort. Both must assign the identical dense id to every profile.
    val p = spark.createDataFrame(
      (0L until 120L).flatMap(i => Seq(
        (i, 0, (i % 17) + 1L), (i, 1, (i % 17) * 3L + 2L))))
      .toDF("profile_id", "pos", "qw")
    val small = Profiles.dedupVectors(p).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Caching.release()
    val dist = Profiles.dedupVectors(p, driverVecLimit = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Caching.release()
    assert(small == dist)
    assert(small.values.toSet == (1L to 17L).toSet)
  }

  test("mergeIndexes: later (specific) table overrides, else base") {
    val base = spark.createDataFrame(Seq(("a", "x", 1), ("a", "y", 1), ("b", "x", 2)))
      .toDF("category", "substance", "profile_id")
    val over = spark.createDataFrame(Seq(("a", "y", 9)))
      .toDF("category", "substance", "profile_id")
    val out = Profiles.mergeIndexes(base, over, Seq("category", "substance"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(out == Map(("a", "x") -> 1, ("a", "y") -> 9, ("b", "x") -> 2))
  }

  test("typed WeightedVectorMerge == long-format combineWeighted") {
    import spark.implicits._
    val rows = Seq(
      ("g", 1.0, Seq(1.0, 0.0)),
      ("g", 3.0, Seq(0.0, 1.0)),
      ("h", 2.0, Seq(0.5, 0.5)))
    val ds = rows.toDS()
    val merged = ds
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new WeightedVectorMerge(2).toColumn)
      .collect().toMap
    assert(merged("g") == Seq(0.25, 0.75))
    assert(merged("h") == Seq(0.5, 0.5))
    // all-zero weights -> uniform fallback
    val z = Seq(("z", 0.0, Seq(0.0, 0.0))).toDS()
      .groupByKey(_._1).mapValues(r => (r._2, r._3))
      .agg(new WeightedVectorMerge(2).toColumn).collect()
    assert(z(0)._2 == Seq(0.5, 0.5))
  }

  test("addProfiles: shared categories weighted-average, disjoint pass through") {
    val p1 = spark.createDataFrame(Seq(
      ("shared", 0, 1.0), ("shared", 1, 0.0), ("only1", 0, 0.25), ("only1", 1, 0.75)))
      .toDF("category", "pos", "ratio")
    val w1 = spark.createDataFrame(Seq(("shared", 1.0), ("only1", 5.0)))
      .toDF("category", "w")
    val p2 = spark.createDataFrame(Seq(("shared", 0, 0.0), ("shared", 1, 1.0)))
      .toDF("category", "pos", "ratio")
    val w2 = spark.createDataFrame(Seq(("shared", 3.0))).toDF("category", "w")
    val out = Profiles.addProfiles(p1, w1, p2, w2)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out(("shared", 0)) == 0.25) // weights 1:3
    assert(out(("shared", 1)) == 0.75)
    assert(out(("only1", 0)) == 0.25) // passes through unchanged
    assert(out(("only1", 1)) == 0.75)
  }

  test("composite pack/unpack round-trips") {
    val p = spark.createDataFrame(Seq(
      (1, "daily", 0, 0.25), (1, "daily", 1, 0.75), (1, "weekly", 0, 1.0)))
      .toDF("profile_id", "kind", "pos", "ratio")
    val packed = Profiles.toComposite(p)
    val daily = packed.where(col("kind") === "daily")
      .collect()(0).getSeq[Double](2)
    assert(daily == Seq(0.25, 0.75))
    val back = Profiles.fromComposite(packed)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2)) -> r.getDouble(3)).toMap
    assert(back == Map(
      (1, "daily", 0) -> 0.25, (1, "daily", 1) -> 0.75, (1, "weekly", 0) -> 1.0))
  }

  test("invalidIndexes flags dangling profile ids, passes -1 sentinel") {
    val idx = spark.createDataFrame(Seq(("a", 1), ("b", -1), ("c", 99)))
      .toDF("category", "profile_id")
    val prof = spark.createDataFrame(Seq((1, 0, 1.0))).toDF("profile_id", "pos", "ratio")
    val bad = Profiles.invalidIndexes(idx, prof).collect().map(_.getString(0))
    assert(bad.toSeq == Seq("c"))
  }

  test("lookupIndex returns most specific match first, wildcards last") {
    val idx = spark.createDataFrame(Seq(
      (Some("a"), Some("x"), 1), (Some("a"), None, 2), (None, None, 3)))
      .toDF("category", "substance", "profile_id")
    val hits = Profiles.lookupIndex(idx, Some("a"), Some("x"))
      .collect().map(_.getInt(2))
    assert(hits.toSeq == Seq(1, 2, 3))
  }

  test("saltedSum equals the direct aggregate") {
    val direct = basicInv.groupBy("cell_id", "category", "substance")
      .agg(org.apache.spark.sql.functions.sum("value").as("value"))
    val salted = graft.ops.Skew.saltedSum(
      basicInv, Seq("cell_id", "category", "substance"), "value")
    assert(collectSet(direct) == collectSet(salted))
  }

  test("vertical resample conserves mass and splits by interval overlap") {
    val p = spark.createDataFrame(Seq((1, 0, 4.0), (1, 1, 6.0)))
      .toDF("profile_id", "level", "r")
    // src edges 0,10,20 ; dst edges 0,5,20: level0 splits 1/2-1/2
    val out = VerticalProfiles.resample(spark, p, Seq(0.0, 10.0, 20.0), Seq(0.0, 5.0, 20.0))
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    assert(out == Map(0 -> 2.0, 1 -> 8.0))
    assert(out.values.sum == 10.0)
  }

  test("vertical violations flags bad sums and negatives only") {
    val p = spark.createDataFrame(Seq(
      (1, 0, 0.5), (1, 1, 0.5), // valid
      (2, 0, 0.4), (2, 1, 0.4), // sums to 0.8
      (3, 0, 1.5), (3, 1, -0.5))) // negative
      .toDF("profile_id", "level", "r")
    val bad = VerticalProfiles.violations(p).collect().map(_.getInt(0)).toSet
    assert(bad == Set(2, 3))
  }

  test("groupProfilesIndexes: weighted member combine, -1 keys, fresh ids") {
    val profiles = spark.createDataFrame(Seq(
      (1, 0, 0.5), (1, 1, 0.5), (2, 0, 1.0), (2, 1, 0.0)))
      .toDF("profile_id", "pos", "ratio")
    val index = spark.createDataFrame(Seq(
      ("a", "k1", 1), ("b", "k1", 2), ("a", "k2", -1), ("b", "k2", -1)))
      .toDF("category", "key", "profile_id")
    val weights = spark.createDataFrame(Seq(
      ("a", "k1", 1.0), ("b", "k1", 3.0), ("a", "k2", 2.0), ("b", "k2", 2.0)))
      .toDF("category", "key", "weight")
    val (newProfiles, newIndex) = Profiles.groupProfilesIndexes(
      profiles, index, weights,
      Map("g" -> Seq("a", "b"), "h" -> Seq("missing_cat")))
    val idx = newIndex.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    // k2 has only -1 members -> -1; group h has no member categories -> -1
    assert(idx(("g", "k2")) == -1)
    assert(idx(("h", "k1")) == -1 && idx(("h", "k2")) == -1)
    val gId = idx(("g", "k1"))
    assert(gId > 0)
    val prof = newProfiles.where(col("profile_id") === gId).collect()
      .map(r => r.getInt(1) -> r.getDouble(2)).toMap
    // combined = (0.5*1 + 1.0*3, 0.5*1 + 0.0*3) = (3.5, 0.5), normalized
    assert(math.abs(prof(0) - 0.875) < 1e-12)
    assert(math.abs(prof(1) - 0.125) < 1e-12)
  }
}
