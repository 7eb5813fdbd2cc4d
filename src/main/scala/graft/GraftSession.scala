package graft

import org.apache.spark.sql.SparkSession

/** The engine's SparkSession recipe: AQE on (runtime re-plan, partition
  * coalescing, skew-join splitting), shuffle partitions sized to the
  * local core count (a real cluster would size to 2-3× total cores),
  * UTC session time. */
object GraftSession {
  def build(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // ns events table
      .config("spark.ui.enabled", "false")
      .withExtensions(graft.functions.GraftFunctions.inject)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(s) // idempotent; covers reuse
    s
  }
}
