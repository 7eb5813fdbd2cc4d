package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's skew-join handles join skew at
  * runtime; aggregation skew on pathological hot keys (one key = 30% of
  * a 100 TB table) is handled here by explicit two-stage salted
  * aggregation: stage 1 aggregates on (key, salt) — spreading a hot key
  * over `saltFactor` reducers — stage 2 merges the partials. For
  * algebraic aggregates over exact values (integer-valued sums, min,
  * max, count) the result is identical to the direct aggregate. */
object Skew {

  /** Two-stage salted sum: `groupBy(keys).sum(valueCol)` with the first
    * stage spread over `saltFactor` sub-keys. */
  def saltedSum(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      saltFactor: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    val salt = pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor))
    df
      .withColumn("_salt", salt)
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(sum(valueCol).as("_partial"))
      .groupBy(keyCols: _*)
      .agg(sum("_partial").as(valueCol))
  }
}
