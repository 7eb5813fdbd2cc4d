package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Substance speciation / merging — reference emiproc/speciation.py.
  *
  * Speciation splits one substance into several with fixed ratios (which
  * need NOT sum to 1 — molar-mass chemistry, emiproc/speciation.py:367-369);
  * merging is the inverse. In long format both are a broadcast join:
  * speciation fans rows out (join against a ratio dimension), merging fans
  * rows in (groupBy-sum after renaming).
  *
  * Single-pass design: the fact table is scanned ONCE. The ratio dimension
  * is grouped into per-key daughter arrays; unmatched rows take an identity
  * array `[(substance, 1.0)]` via coalesce, and one explode produces both
  * the speciated and the pass-through rows. (The earlier two-branch form —
  * speciated join ∪ anti-join pass-through — scanned the input twice; at
  * 100 TB that is two full passes where one suffices.) `value * 1.0` is
  * bit-exact in IEEE, so pass-through rows hash identically.
  */
object Speciation {

  /** Daughter-array element type shared by the real and identity branches. */
  private def identityParts(sub: Column, ratioName: String): Column =
    array(struct(sub.as("new_substance"), lit(1.0).as(ratioName)))

  /** Split (category, substance) rows by a ratio table — reference
    * `speciate_inventory` (emiproc/speciation.py:360-436). Rows whose
    * (category, substance) appear in the table are replaced by one row per
    * (new_substance, ratio); others pass through unchanged. One scan, one
    * broadcast join, one explode. */
  def speciate(
      spark: SparkSession,
      emissions: DataFrame,
      ratios: Seq[(String, String, String, Double)]): DataFrame = {
    val dim = spark
      .createDataFrame(ratios)
      .toDF("category", "substance", "new_substance", "ratio")
      .groupBy("category", "substance")
      .agg(sort_array(collect_list(struct(col("new_substance"), col("ratio"))))
        .as("parts"))
    emissions
      .join(broadcast(dim), Seq("category", "substance"), "left")
      .withColumn("p",
        explode(coalesce(col("parts"), identityParts(col("substance"), "ratio"))))
      .select(
        col("cell_id"), col("category"),
        col("p.new_substance").as("substance"),
        (col("value") * col("p.ratio")).as("value"))
  }

  /** NOx → NO + NO2 with the 30/46 molar-mass ratio — reference
    * `speciate_nox` (emiproc/speciation.py:439-501): NO gets
    * (1-f)·30/46, NO2 gets f, where f is the NO2 mass fraction.
    * Join-free single pass: the daughter array is a CASE expression. */
  def speciateNox(
      spark: SparkSession,
      emissions: DataFrame,
      noxSubstance: String = "NOx",
      no2Fraction: Double = 0.18): DataFrame = {
    val parts = when(col("substance") === noxSubstance,
      array(
        struct(lit("NO").as("new_substance"),
          lit((1.0 - no2Fraction) * 30.0 / 46.0).as("ratio")),
        struct(lit("NO2").as("new_substance"),
          lit(no2Fraction).as("ratio"))))
      .otherwise(identityParts(col("substance"), "ratio"))
    emissions
      .withColumn("p", explode(parts))
      .select(
        col("cell_id"), col("category"),
        col("p.new_substance").as("substance"),
        (col("value") * col("p.ratio")).as("value"))
  }

  /** Country-dependent speciation — the reference's table-driven
    * `speciate` country path (emiproc/speciation.py:129-348: per-cell
    * effective ratio = country_fractions · ratios, `:228-260`; cells
    * with no country coverage fall back to the default ratio row, the
    * `-99` "homeless" rule `:243-257`).
    *
    * `fractions(cell_id, country, fraction)` × `ratios(country,
    * substance, new_substance, ratio)` (+ `defaultRatios(substance,
    * new_substance, ratio)`): the per-cell effective ratio table (cells ×
    * daughters — grid-scale metadata) is grouped to a per-(cell,
    * substance) map and broadcast; the fact table is scanned once, with
    * the default daughters exploded and the per-daughter cell override
    * looked up in the map.
    *
    * Divergence note: the reference RAISES when a cell has emissions but
    * no country and no default (test_speciation.py:92-104); here
    * `defaultRatios` is a required argument, so that state is
    * unrepresentable — pass the `-99` default rows the reference would
    * fall back to. */
  def speciateByCountry(
      spark: SparkSession,
      emissions: DataFrame,
      fractions: DataFrame,
      ratios: Seq[(String, String, String, Double)],
      defaultRatios: Seq[(String, String, Double)]): DataFrame = {
    val ratioDf = spark.createDataFrame(ratios)
      .toDF("country", "substance", "new_substance", "ratio")
    val defaultDim = spark.createDataFrame(defaultRatios)
      .toDF("substance", "new_substance", "default_ratio")
      .groupBy("substance")
      .agg(sort_array(
        collect_list(struct(col("new_substance"), col("default_ratio"))))
        .as("dparts"))
    // per-cell effective ratio = sum_c fraction * ratio(country), as a
    // new_substance -> ratio map per (cell, substance)
    val cellRatio = fractions
      .join(broadcast(ratioDf), "country")
      .groupBy("cell_id", "substance", "new_substance")
      .agg(sum(col("fraction") * col("ratio")).as("eff_ratio"))
      .groupBy("cell_id", "substance")
      .agg(map_from_entries(
        collect_list(struct(col("new_substance"), col("eff_ratio"))))
        .as("eff_map"))
    emissions
      .join(broadcast(defaultDim), Seq("substance"), "left")
      .join(broadcast(cellRatio), Seq("cell_id", "substance"), "left")
      .withColumn("_touched", col("dparts").isNotNull)
      .withColumn("p",
        explode(coalesce(col("dparts"),
          identityParts(col("substance"), "default_ratio"))))
      .select(
        col("cell_id"), col("category"),
        col("p.new_substance").as("substance"),
        (col("value") * when(col("_touched"),
          coalesce(
            element_at(col("eff_map"), col("p.new_substance")),
            col("p.default_ratio")))
          .otherwise(lit(1.0))).as("value"))
  }

  /** Table-driven speciation with the reference's full coordinate set —
    * `speciate` (emiproc/speciation.py:129-348): the ratio table (from
    * [[graft.sources.SpeciationCsv.read]]) may carry `year` (filtered to
    * the inventory year, `:200-209`), `type` (gridded vs shapped,
    * `:220-223`), `category` (per-category ratios, `:111-126`) and
    * `country` coordinates. Country rows are folded with the cell×country
    * fraction table into per-cell effective ratios (`:228-239`); cells
    * with zero country coverage take the `-99` default row (`:243-257`).
    *
    * Divergence note: a (category, substance) row with NO table entry
    * passes through unchanged here; the reference raises. The engine
    * favors explicit pass-through — validate the table up front if strict
    * behavior is needed.
    *
    * Single pass over the fact table: the `-99` rows form the daughter
    * spine per category, per-daughter cell overrides come from a
    * broadcast (cell, category) → map lookup. */
  def speciateFromTable(
      spark: SparkSession,
      emissions: DataFrame,
      fractions: DataFrame,
      table: DataFrame, // long: (category, country, new_substance, ratio) [+year +type]
      substance: String,
      year: Option[Int] = None,
      typ: Option[String] = None): DataFrame = {
    var t = table
    if (t.columns.contains("year"))
      year.foreach(y => t = t.where(col("year") === y))
    if (t.columns.contains("type"))
      typ.foreach(tp => t = t.where(col("type") === tp))
    t = t.select("category", "country", "new_substance", "ratio")

    val dparts = t.where(col("country") === "-99")
      .groupBy("category")
      .agg(sort_array(
        collect_list(struct(col("new_substance"), col("ratio").as("default_ratio"))))
        .as("dparts"))
    val cellRatio = fractions
      .join(t.where(col("country") =!= "-99"), "country")
      .groupBy("cell_id", "category", "new_substance")
      .agg(sum(col("fraction") * col("ratio")).as("eff_ratio"))
      .groupBy("cell_id", "category")
      .agg(map_from_entries(
        collect_list(struct(col("new_substance"), col("eff_ratio"))))
        .as("eff_map"))
    emissions
      .join(broadcast(dparts), Seq("category"), "left")
      .join(broadcast(cellRatio), Seq("cell_id", "category"), "left")
      .withColumn("_touched",
        col("dparts").isNotNull && col("substance") === substance)
      .withColumn("p",
        explode(when(col("_touched"), col("dparts"))
          .otherwise(identityParts(col("substance"), "default_ratio"))))
      .select(
        col("cell_id"), col("category"),
        col("p.new_substance").as("substance"),
        (col("value") * when(col("_touched"),
          coalesce(
            element_at(col("eff_map"), col("p.new_substance")),
            col("p.default_ratio")))
          .otherwise(lit(1.0))).as("value"))
  }

  /** CO2 fossil/biogenic split table from per-category biogenic
    * fractions — the reference's `ZH_CO2_BIO_RATIOS` construction
    * (emiproc/inventories/zurich/speciation_co2_bio.py:76-85:
    * row_stack([r, 1 - r]) over substances (CO2_bio, CO2_fos)), emitted
    * in [[speciateFromTable]]'s long layout with the `-99` country
    * wildcard. Pair with [[graft.model.ZurichData.Co2BioRatios]] for the
    * published Zurich table. */
  def co2BioTable(
      spark: SparkSession,
      ratios: Map[String, Double],
      bioSubstance: String = "CO2_bio",
      fossilSubstance: String = "CO2_fos"): DataFrame =
    spark.createDataFrame(ratios.toSeq.flatMap { case (c, r) =>
      Seq((c, "-99", bioSubstance, r), (c, "-99", fossilSubstance, 1.0 - r))
    }).toDF("category", "country", "new_substance", "ratio")

  /** Sum several substances into one — reference `merge_substances`
    * (emiproc/speciation.py:504-569). */
  def mergeSubstances(
      spark: SparkSession,
      emissions: DataFrame,
      merged: String,
      parts: Seq[String]): DataFrame =
    mergeSubstancesMap(spark, emissions, Map(merged -> parts))

  /** The reference's FULL `merge_substances` surface
    * (emiproc/speciation.py:504-569 + tests/test_speciation.py:312-371):
    * several merge groups at once, `drop = false` KEEPS the source
    * substances alongside the merged ones, and the reference's two
    * validation errors are mirrored — a merge target may not be used as
    * a source of another group (`{"GHG": [...], "GHG2": ["GHG"]}` and
    * `{"CO2": [...], "GHG2": ["CO2"]}` both raise). One broadcast dim
    * join + one hash aggregate either way.
    *
    * Edge semantics match the reference exactly: a pre-existing target
    * substance's rows are OVERWRITTEN by the merged result, never summed
    * into it (`inv_df[new_sub] = sum(...)` assigns the column) — unless
    * the target is also one of its own sources, in which case its old
    * values feed the sum like any other source. A source absent from the
    * inventory raises (pandas KeyError at `inv_df[sub]`); that check
    * needs a distinct-substance scan, so `validate = false` lets the
    * 100 TB path skip the extra job. */
  def mergeSubstancesMap(
      spark: SparkSession,
      emissions: DataFrame,
      substances: Map[String, Seq[String]],
      drop: Boolean = true,
      validate: Boolean = true): DataFrame = {
    val newNames = substances.keySet
    substances.foreach { case (m, parts) =>
      parts.foreach { p =>
        require(!(newNames - m).contains(p),
          s"substance '$p' is both a merge target and a merge source " +
            "(reference merge_substances raises here)")
      }
    }
    val flat = substances.toSeq.flatMap { case (m, ps) => ps.map(p => (p, m)) }
    require(flat.map(_._1).distinct.size == flat.size,
      s"a substance is mapped into more than one merged group")
    if (validate) {
      val present = emissions.select("substance").distinct()
        .collect().map(_.getString(0)).toSet
      for ((_, parts) <- substances; p <- parts)
        require(present.contains(p),
          s"merge source substance '$p' not in the inventory " +
            "(reference merge_substances KeyError, speciation.py:504-569)")
    }
    val allTargets = newNames.toSeq
    val mdf = spark.createDataFrame(flat).toDF("substance", "_m")
    val joined = emissions.join(broadcast(mdf), Seq("substance"), "left")
    if (drop)
      joined
        // overwrite semantics: a pre-existing target row that is not
        // itself a source never survives into the merged result
        .where(col("_m").isNotNull || !col("substance").isin(allTargets: _*))
        .withColumn("substance", coalesce(col("_m"), col("substance")))
        .groupBy("cell_id", "category", "substance")
        .agg(sum("value").as("value"))
    else
      emissions
        .where(!col("substance").isin(allTargets: _*))
        .unionByName(
          joined.where(col("_m").isNotNull)
            .groupBy(col("cell_id"), col("category"), col("_m").as("substance"))
            .agg(sum("value").as("value")))
  }
}
