package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Swiss-inventory raster scaling — the part of SwissRasters S5 beyond
  * the ASCII reader: each category/substance raster is a spatial
  * DISTRIBUTION that gets normalized to sum 1 and multiplied by the
  * inventory's total emission for that (category, substance)
  * (reference emiproc/inventories/swiss.py:290-295:
  * `_raster_array / _raster_array.sum() * total_emissions`), after the
  * point-source sums are deducted from the CSV totals
  * (swiss.py:169-187 — raises when point sources exceed the total).
  */
object SwissRasters {

  /** `rasters(cell_id, category, substance, value)` ×
    * `totals(category, substance, total)` → value / Σ_cells value ×
    * total. One window per (category, substance) partition — grid-sized
    * partitions, one shuffle. */
  def scaleToTotals(rasters: DataFrame, totals: DataFrame): DataFrame = {
    val w = Window.partitionBy("category", "substance")
    rasters
      .withColumn("_rsum", sum("value").over(w))
      .join(broadcast(totals), Seq("category", "substance"))
      .select(
        col("cell_id"), col("category"), col("substance"),
        (col("value") / col("_rsum") * col("total")).as("value"))
  }

  /** Deduct per-(category, substance) point-source sums from the CSV
    * totals before grid scaling (swiss.py:169-187). Throws when a point
    * sum exceeds its total, like the reference. */
  def deductPointSources(totals: DataFrame, pointSums: DataFrame): DataFrame = {
    val joined = totals
      .join(pointSums.withColumnRenamed("total", "point_total"),
        Seq("category", "substance"), "left")
      .select(
        col("category"), col("substance"),
        (col("total") - coalesce(col("point_total"), lit(0.0))).as("total"))
    val bad = joined.where(col("total") < 0).limit(10).collect()
    require(bad.isEmpty,
      s"point sources exceed inventory total (swiss.py:177-181): ${bad.mkString("; ")}")
    joined
  }
}
