package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Substance speciation / merging — reference emiproc/speciation.py.
  *
  * Speciation splits one substance into several with fixed ratios (which
  * need NOT sum to 1 — molar-mass chemistry, emiproc/speciation.py:367-369);
  * merging is the inverse. In long format both are a broadcast join:
  * speciation fans rows out (join against a ratio dimension), merging fans
  * rows in (groupBy-sum after renaming). No shuffle on the speciation side
  * (map-side broadcast join), one shuffle for the merge aggregate.
  */
object Speciation {

  /** Split (category, substance) rows by a ratio table — reference
    * `speciate_inventory` (emiproc/speciation.py:351-436). Rows whose
    * (category, substance) appear in the table are replaced by one row per
    * (new_substance, ratio); others pass through unchanged. */
  def speciate(
      spark: SparkSession,
      emissions: DataFrame,
      ratios: Seq[(String, String, String, Double)]): DataFrame = {
    val dim = spark
      .createDataFrame(ratios)
      .toDF("category", "substance", "new_substance", "ratio")
    val speciated = emissions
      .join(broadcast(dim), Seq("category", "substance"))
      .select(
        col("cell_id"), col("category"),
        col("new_substance").as("substance"),
        (col("value") * col("ratio")).as("value"))
    val untouchedKeys = dim.select("category", "substance").distinct()
    val untouched = emissions.join(
      broadcast(untouchedKeys), Seq("category", "substance"), "left_anti")
    speciated.unionByName(untouched.select("cell_id", "category", "substance", "value"))
  }

  /** NOx → NO + NO2 with the 30/46 molar-mass ratio — reference
    * `speciate_nox` (emiproc/speciation.py:439-501): NO gets
    * (1-f)·30/46, NO2 gets f, where f is the NO2 mass fraction. */
  def speciateNox(
      spark: SparkSession,
      emissions: DataFrame,
      noxSubstance: String = "NOx",
      no2Fraction: Double = 0.18): DataFrame = {
    val cats = Seq(noxSubstance)
    val isNox = col("substance") === noxSubstance
    val nox = emissions.where(isNox)
    val rest = emissions.where(!isNox)
    val no = nox.select(
      col("cell_id"), col("category"), lit("NO").as("substance"),
      (col("value") * ((1.0 - no2Fraction) * 30.0 / 46.0)).as("value"))
    val no2 = nox.select(
      col("cell_id"), col("category"), lit("NO2").as("substance"),
      (col("value") * no2Fraction).as("value"))
    val _ = cats
    no.unionByName(no2).unionByName(rest.select("cell_id", "category", "substance", "value"))
  }

  /** Country-dependent speciation — the reference's table-driven
    * `speciate` country path (emiproc/speciation.py:129-348: per-cell
    * effective ratio = country_fractions · ratios, `:228-260`; cells
    * with no country coverage fall back to the default ratio row, the
    * `-99` "homeless" rule `:243-257`).
    *
    * `fractions(cell_id, country, fraction)` × `ratios(country,
    * substance, new_substance, ratio)` (+ `defaultRatios(substance,
    * new_substance, ratio)`): one broadcast of the per-cell effective
    * ratio table (cells × daughters — grid-scale metadata), one
    * fact-table join. */
  def speciateByCountry(
      spark: SparkSession,
      emissions: DataFrame,
      fractions: DataFrame,
      ratios: Seq[(String, String, String, Double)],
      defaultRatios: Seq[(String, String, Double)]): DataFrame = {
    val ratioDf = spark.createDataFrame(ratios)
      .toDF("country", "substance", "new_substance", "ratio")
    val defaultDf = spark.createDataFrame(defaultRatios)
      .toDF("substance", "new_substance", "default_ratio")
    // per-cell effective ratio = sum_c fraction * ratio(country)
    val cellRatio = fractions
      .join(broadcast(ratioDf), "country")
      .groupBy("cell_id", "substance", "new_substance")
      .agg(sum(col("fraction") * col("ratio")).as("eff_ratio"))
    val speciated = emissions
      .join(broadcast(defaultDf), Seq("substance"))
      .join(broadcast(cellRatio),
        Seq("cell_id", "substance", "new_substance"), "left")
      .select(
        col("cell_id"), col("category"),
        col("new_substance").as("substance"),
        (col("value") * coalesce(col("eff_ratio"), col("default_ratio"))).as("value"))
    val touched = defaultDf.select("substance").distinct()
    val untouched = emissions.join(broadcast(touched), Seq("substance"), "left_anti")
    speciated.unionByName(
      untouched.select("cell_id", "category", "substance", "value"))
  }

  /** Sum several substances into one — reference `merge_substances`
    * (emiproc/speciation.py:504-569). */
  def mergeSubstances(
      spark: SparkSession,
      emissions: DataFrame,
      merged: String,
      parts: Seq[String]): DataFrame = {
    val renamed = emissions.withColumn(
      "substance",
      when(col("substance").isin(parts: _*), lit(merged)).otherwise(col("substance")))
    renamed
      .groupBy("cell_id", "category", "substance")
      .agg(sum("value").as("value"))
  }
}
