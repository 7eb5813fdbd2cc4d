package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Population → emission inventory — the reference's
  * `people_to_emissions` (emiproc/human_respiration.py:78-160; factors
  * :12-40): emissions(cell) = population(cell) × per-capita emission
  * factor × time-ratio (fraction of the day spent at that location).
  * A broadcast dim join + arithmetic, one narrow pass. */
object HumanRespiration {

  /** `population(cell_id, people_kind, n_people)` ×
    * `factors(people_kind, substance, kg_per_person_per_year)` ×
    * `timeRatio` → long inventory rows under `category`. */
  def peopleToEmissions(
      spark: SparkSession,
      population: DataFrame,
      factors: Seq[(String, String, Double)],
      timeRatio: Double,
      category: String = "human_respiration"): DataFrame = {
    val dim = spark.createDataFrame(factors)
      .toDF("people_kind", "substance", "ef")
    population
      .join(broadcast(dim), "people_kind")
      .groupBy(col("cell_id"), lit(category).as("category"), col("substance"))
      .agg(sum(col("n_people") * col("ef") * timeRatio).as("value"))
  }
}
