package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table discipline for the 100 TB fact layout (SURVEY §3/§7 M6):
  * the emission fact table is written bucketed by `cell_id`, so the
  * recurring joins on cell_id (weights, crops, masks, profiles) and the
  * (cell, cat, sub) aggregates read pre-partitioned data — no shuffle on
  * the fact side. Verified by BucketingSpec: a join of two tables
  * bucketed on the same key plans ZERO shuffle exchanges. */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets for
    * merge-friendly reads). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int = 32): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
