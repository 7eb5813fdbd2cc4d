package graft.profiles

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Profile algebra in long format `(profile_id, pos, ratio|weight)` —
  * the reference's profile operators (emiproc/profiles/operators.py,
  * emiproc/profiles/utils.py, emiproc/profiles/temporal/composite.py).
  *
  * Long format makes every reference kernel a join + window/aggregate:
  * normalization is a window divide, weighted combination is one hash
  * aggregate, dedup is a group-by on the canonicalized vector. Profile
  * tables are tiny next to the emission fact table — they broadcast.
  */
object Profiles {

  /** Normalize positions to sum 1 within each profile — the reference's
    * `rescale_ratios` (emiproc/profiles/temporal/composite.py:29-45).
    * Input `(profile_id, pos, w)`; output `(profile_id, pos, ratio)`. */
  def normalize(profiles: DataFrame): DataFrame = {
    val win = Window.partitionBy("profile_id")
    profiles.select(
      col("profile_id"), col("pos"),
      (col("w") / sum("w").over(win)).as("ratio"))
  }

  /** Weighted combination of profiles along a dimension — the reference's
    * `combine_profiles` (emiproc/profiles/operators.py:141-250): for each
    * group, sum the member vectors weighted by emission mass, then
    * renormalize. `weights(group, member, weight)` ⋈ `profiles(member,
    * pos, w)` → `(group, pos, ratio)`. Stays exact when both inputs are
    * integer-valued (products < 2^53). */
  def combineWeighted(weights: DataFrame, profiles: DataFrame): DataFrame = {
    val merged = weights
      .join(profiles, "member")
      .groupBy("group", "pos")
      .agg(sum(col("weight") * col("w")).as("cw"))
    val win = Window.partitionBy("group")
    merged.select(
      col("group"), col("pos"),
      (col("cw") / sum("cw").over(win)).as("ratio"))
  }

  /** Dedup identical (quantized) profile vectors and assign dense ids —
    * the reference's `ratios_dataarray_to_profiles`
    * (emiproc/profiles/utils.py:372-423, np.unique over vectors).
    * Canonical form: positions sorted, `pos:val` joined by comma; the
    * dense id is the 1-based rank of the vector in the globally sorted
    * distinct-vector set — deterministic and engine-portable
    * (= `dense_rank` over the vector in SQL).
    *
    * Scale path: the rank is assigned on the (much smaller) DISTINCT
    * vector set via a range-partitioned sort + `zipWithIndex`, then
    * joined back — no single-partition global window over all profiles.
    * Input `(profile_id, pos, qw)` (qw integral); output
    * `(profile_id, dedup_id)`. */
  def dedupVectors(
      profiles: DataFrame,
      driverVecLimit: Long = 100000L): DataFrame = {
    val vecs = profiles
      .groupBy("profile_id")
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("qw")))),
            x => concat(x.getField("pos"), lit(":"), x.getField("qw"))),
          ",").as("vec"))
    val cached = graft.Caching.cache(vecs) // read twice: ids + join-back
    cached.join(denseIdsByVec(cached, "dedup_id", driverVecLimit), "vec")
      .select(col("profile_id"), col("dedup_id"))
  }

  /** Dense 1-based ids for the distinct values of a `vec` string column —
    * rank in the globally sorted distinct set (= SQL `dense_rank` over the
    * vector), computed WITHOUT a single-partition window and without
    * leaving the DataFrame API: range-partition the (small) distinct set
    * by `vec`, rank locally per partition, then add per-partition offsets
    * (a bounded collect of one count per shuffle partition — the classic
    * two-phase global-rank construction). Everything stays inside
    * codegen/AQE except the two bounded jobs. */
  private def denseIdsByVec(
      vecs: DataFrame,
      idName: String,
      driverVecLimit: Long = 100000L): DataFrame = {
    val spark = vecs.sparkSession
    // ADAPTIVE small path (same shape as Clustering.driverEdgeLimit):
    // profile vectors are METADATA-scale in practice (a few thousand
    // distinct shapes even in continental inventories), and the
    // two-phase rank below pays two cache materializations + a
    // per-partition-count collect + a join-back — ~9 s of fixed cost at
    // sf0.1 for 1000 vectors. Below `driverVecLimit` distinct vectors
    // (bounded: one count first), sort and rank on the driver — exact
    // same ids (1-based rank in the globally sorted distinct set; the
    // specs pin both paths against each other). The range-partitioned
    // two-phase rank remains the 100 TB path; driverVecLimit = 0
    // forces it.
    val distinctVecs = graft.Caching.cache(vecs.select("vec").distinct())
    val isString = distinctVecs.schema.head.dataType ==
      org.apache.spark.sql.types.StringType
    val nVecs = distinctVecs.count()
    // struct-typed vecs (groupProfilesIndexes) keep the distributed
    // path: replicating Spark's struct ordering on the driver is not
    // worth it for a caller that is already index-cube-scale
    if (isString && nVecs <= driverVecLimit) {
      // UTF-8 byte order, matching Spark's UTF8String comparison (plain
      // String.sorted is UTF-16 code-unit order — diverges above BMP)
      val utf8Ord: Ordering[String] = (a: String, b: String) =>
        java.util.Arrays.compareUnsigned(
          a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      val sorted = distinctVecs.collect().map(_.getString(0)).sorted(utf8Ord)
      val ids = sorted.zipWithIndex.map { case (v, i) => (v, i + 1L) }
      return spark.createDataFrame(ids.toSeq).toDF("vec", idName)
    }
    // persist: the partition ids assigned by the range shuffle must be
    // identical across the counts job and the final join job
    val parted = graft.Caching.cache(
      distinctVecs
        .repartitionByRange(col("vec"))
        .withColumn("_pid", spark_partition_id()))
    val counts = parted.groupBy("_pid").agg(count(lit(1)).as("_cnt"))
      .orderBy("_pid").collect()
    // parted is materialized by the collect above — the pre-shuffle
    // distinct cache would otherwise be held TWICE on the large path
    graft.Caching.release(distinctVecs)
    var acc = 0L
    val offsets = counts.toSeq.map { r =>
      val o = (r.getInt(0), acc); acc += r.getLong(1); o
    }
    val offDf = spark.createDataFrame(offsets).toDF("_pid", "_off")
    val win = Window.partitionBy("_pid").orderBy("vec")
    parted
      .withColumn("_rn", row_number().over(win))
      .join(broadcast(offDf), "_pid")
      .select(col("vec"), (col("_off") + col("_rn")).as(idName))
  }

  /** P3 — group profiles and their index cube along a dimension —
    * the reference's `group_profiles_indexes`
    * (emiproc/profiles/operators.py:307-404): for each group of
    * categories, members' profiles are emission-weight combined per
    * remaining key (via `combine_profiles`, `:141-250`), the NEW
    * profiles get fresh ids offset past each other (`:372-380` — here a
    * dense 1-based id per (group, key)), and keys whose members are all
    * `-1` stay `-1` (`:343-358`). Zero total weight falls back to the
    * uniform profile (P16 rescale rule).
    *
    * `index(category, key, profile_id)`, `weights(category, key,
    * weight)`; returns (newProfiles(profile_id, pos, ratio),
    * newIndex(category=group, key, profile_id)). The id window runs
    * over the index cube — METADATA-scale (categories × keys), like the
    * reference's driver-side numpy pass, never fact data. */
  def groupProfilesIndexes(
      profiles: DataFrame,
      index: DataFrame,
      weights: DataFrame,
      groups: Map[String, Seq[String]]): (DataFrame, DataFrame) = {
    val spark = profiles.sparkSession
    val groupDim = broadcast(spark.createDataFrame(
      groups.toSeq.flatMap { case (g, cats) => cats.map(c => (c, g)) })
      .toDF("category", "grp"))
    val combined = index.where(col("profile_id") =!= -1)
      .join(groupDim, "category")
      .join(weights, Seq("category", "key"))
      .join(profiles, "profile_id")
      .groupBy("grp", "key", "pos")
      .agg(sum(col("ratio") * col("weight")).as("rw"))
    val win = Window.partitionBy("grp", "key")
    val normalized = combined.withColumn("ratio",
      when(sum("rw").over(win) === 0, lit(1.0) / count(lit(1)).over(win))
        .otherwise(col("rw") / sum("rw").over(win)))
    // dense 1-based ids ordered by (grp, key) — via the same two-phase
    // partition-local rank as P4, never a global single-partition window
    val ids = denseIdsByVec(
      normalized.select(struct(col("grp"), col("key")).as("vec")), "profile_id")
      .select(col("vec.grp").as("grp"), col("vec.key").as("key"),
        col("profile_id").cast("int").as("profile_id"))
    val newProfiles = normalized.join(ids, Seq("grp", "key"))
      .select("profile_id", "pos", "ratio")
    val allGroups = spark.createDataFrame(groups.keys.toSeq.map(Tuple1(_)))
      .toDF("grp")
    val newIndex = index.select("key").distinct()
      .crossJoin(allGroups)
      .join(ids, Seq("grp", "key"), "left")
      .select(col("grp").as("category"), col("key"),
        coalesce(col("profile_id"), lit(-1)).as("profile_id"))
    (newProfiles, newIndex)
  }

  /** Country-dim profiles → cell-dim via the cell×country fraction table —
    * the reference's `country_to_cells` fraction method
    * (emiproc/profiles/operators.py:517-537: sf.dot(country_fractions)).
    * `fractions(cell_id, country, fraction)` ⋈ `countryFactors(country,
    * factor)` → per-cell factor = Σ_c fraction·factor. The factor table is
    * a tiny broadcast; one shuffle on cell_id. */
  def countryToCells(fractions: DataFrame, countryFactors: DataFrame): DataFrame =
    fractions
      .join(broadcast(countryFactors), "country")
      .groupBy("cell_id")
      .agg(sum(col("fraction") * col("factor")).as("factor"))

  /** Group cells by identical per-category profile assignment — the
    * reference's `group_profile_cells_by_regions`
    * (emiproc/profiles/utils.py:426-468, np.unique over cell rows of the
    * index cube; used by the ICON export's "profile regions").
    * `index(cell_id, category, profile_id)` → `(cell_id, region_id)` with
    * dense 1-based region ids, deterministic by the sorted vector. */
  def groupCellsByRegions(index: DataFrame): DataFrame = {
    val vecs = index
      .groupBy("cell_id")
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("category"), col("profile_id")))),
            x => concat(x.getField("category"), lit(":"), x.getField("profile_id"))),
          ",").as("vec"))
    val cached = graft.Caching.cache(vecs) // read twice: ids + join-back
    cached.join(denseIdsByVec(cached, "region_id"), "vec")
      .select(col("cell_id"), col("region_id"))
  }

  /** Re-grid cell-dimension profiles through a remap weight table — the
    * reference's `remap_profiles` (emiproc/profiles/operators.py:571-666):
    * each output cell's profile is the emission-mass × remap-weight
    * weighted combination of its source cells' profiles, renormalized.
    * `cellProfiles(cell_id, pos, ratio)` ⋈ `cellWeights(cell_id, w)` ⋈
    * `remapWeights(src_cell, dst_cell, weight)`. One shuffle on
    * (dst_cell, pos). */
  def remapProfiles(
      cellProfiles: DataFrame,
      cellWeights: DataFrame,
      remapWeights: DataFrame): DataFrame = {
    val combined = cellProfiles
      .join(cellWeights, "cell_id")
      .join(remapWeights.withColumnRenamed("src_cell", "cell_id"), "cell_id")
      .groupBy(col("dst_cell").as("cell_id"), col("pos"))
      .agg(sum(col("ratio") * col("w") * col("weight")).as("cw"))
    val win = Window.partitionBy("cell_id")
    combined.select(
      col("cell_id"), col("pos"),
      (col("cw") / sum("cw").over(win)).as("ratio"))
  }

  /** Pad a cell→profile index with the constant-profile sentinel for
    * cells lacking an assignment — the reference's
    * `add_constant_profile_to_missing_cells`
    * (emiproc/profiles/operators.py:746-797; `-1` = constant). */
  def padMissingCells(
      spark: org.apache.spark.sql.SparkSession,
      index: DataFrame,
      ncells: Long): DataFrame =
    spark.range(ncells).select(col("id").as("cell_id"))
      .join(index, Seq("cell_id"), "left")
      .withColumn("profile_id", coalesce(col("profile_id"), lit(-1)))

  /** Merge the profiles of two inventories — the reference's
    * `add_profiles` (emiproc/profiles/operators.py:669-743): per
    * category, the combined profile is the emission-mass-weighted sum of
    * both sides' profiles, renormalized. Categories present on only one
    * side pass through unchanged (the reference's disjoint fast path
    * :700-713 is the same formula — normalization restores the original
    * ratios). `pX(category, pos, ratio)` ⋈ `wX(category, w)`. */
  def addProfiles(
      p1: DataFrame, w1: DataFrame,
      p2: DataFrame, w2: DataFrame): DataFrame = {
    def side(p: DataFrame, w: DataFrame) =
      p.join(broadcast(w), "category")
        .select(col("category"), col("pos"), (col("ratio") * col("w")).as("rw"))
    val merged = side(p1, w1).unionByName(side(p2, w2))
      .groupBy("category", "pos")
      .agg(sum("rw").as("cw"))
    val win = Window.partitionBy("category")
    merged.select(
      col("category"), col("pos"),
      (col("cw") / sum("cw").over(win)).as("ratio"))
  }

  /** Long rows → composite blocks: one row per (profile, kind) with the
    * ratio vector as an ordered array — the reference's
    * `make_composite_profiles` packing (emiproc/profiles/temporal/
    * composite.py:375-436). */
  def toComposite(profiles: DataFrame): DataFrame =
    profiles
      .groupBy("profile_id", "kind")
      .agg(
        transform(
          array_sort(collect_list(struct(col("pos"), col("ratio")))),
          x => x.getField("ratio")).as("ratios"))

  /** Composite blocks → long rows (`split_composite_profile`). */
  def fromComposite(composite: DataFrame): DataFrame =
    composite.select(
      col("profile_id"), col("kind"),
      posexplode(col("ratios")).as(Seq("pos", "ratio")))

  /** Index-cube validation — the reference's `check_valid_indexes`
    * (emiproc/profiles/utils.py:54-93): profile ids must be ≥ -1 and
    * reference an existing profile (or the -1 constant); returns the
    * violating rows (empty = valid). */
  def invalidIndexes(index: DataFrame, profiles: DataFrame): DataFrame = {
    val known = profiles.select("profile_id").distinct()
      .withColumnRenamed("profile_id", "known_id")
    index
      .join(broadcast(known), col("profile_id") === col("known_id"), "left")
      .where(col("profile_id") =!= -1 && col("known_id").isNull)
      .drop("known_id")
  }

  /** Point lookup into the index cube with most-specific-match semantics
    * (`get_desired_profile_index`, emiproc/profiles/utils.py:95-151):
    * rows matching the requested coordinates, NULL dims acting as
    * wildcards, most specific (fewest NULLs) first. */
  def lookupIndex(
      index: DataFrame,
      category: Option[String],
      substance: Option[String]): DataFrame = {
    def m(c: String, v: Option[String]) =
      v.map(x => col(c).isNull || col(c) === x).getOrElse(col(c).isNull)
    index
      .where(m("category", category) && m("substance", substance))
      .withColumn("specificity",
        when(col("category").isNotNull, 1).otherwise(0) +
          when(col("substance").isNotNull, 1).otherwise(0))
      .orderBy(col("specificity").desc)
  }

  /** Merge profile index tables of increasing specificity — the
    * reference's `merge_indexes` (emiproc/profiles/utils.py:271-339):
    * later (more specific) tables override earlier via coalesce after
    * left joins. Each index table maps key columns → profile_id. */
  def mergeIndexes(base: DataFrame, overrides: DataFrame, keys: Seq[String]): DataFrame = {
    val o = overrides.withColumnRenamed("profile_id", "profile_id_override")
    base
      .join(o, keys, "left")
      .withColumn("profile_id",
        coalesce(col("profile_id_override"), col("profile_id")))
      .drop("profile_id_override")
  }
}
