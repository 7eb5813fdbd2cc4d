package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling: per-column row/null/distinct census in ONE
  * pass — the stack-to-long pattern (explode an array of (column, value)
  * structs, then a single grouped aggregate on column name). Values are
  * compared through their string rendering, which is injective per
  * engine, so distinct counts equal distinct counts of the raw values.
  * Scales as one narrow explode (×ncols) + one bounded shuffle (ncols
  * groups). */
object DataQuality {

  def profile(df: DataFrame): DataFrame = {
    val stacked = df.select(
      explode(array(df.columns.toIndexedSeq.map(c =>
        struct(lit(c).as("column"), col(c).cast("string").as("value"))): _*)).as("s"))
      .select(col("s.column").as("column"), col("s.value").as("value"))
    stacked
      .groupBy("column")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("value").isNull, 1).otherwise(0)).as("n_nulls"),
        count_distinct(col("value")).as("n_distinct"))
  }
}
