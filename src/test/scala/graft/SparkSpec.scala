package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session keeps
  * `sbt test` fast; suites must not stop() it). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // specs run under the engine's production state-store default
      // (GraftSession sets the same) so every streaming spec certifies
      // the RocksDB path, not just the heap-backed demo path
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import scala.jdk.CollectionConverters._

  /** Long-format emissions fixture — FIXTURES.md §1.2 (reference
    * emiproc/tests_utils/test_inventories.py:16-27): 5 cells,
    * adf/CH4 = cell+3, adf/CO2 = cell, liku/CO2 = cell, test/NH3 = cell+1. */
  def basicInv: DataFrame = {
    val rows = (0L until 5L).flatMap { c =>
      Seq(
        (c, "adf", "CH4", (c + 3).toDouble),
        (c, "adf", "CO2", c.toDouble),
        (c, "liku", "CO2", c.toDouble),
        (c, "test", "NH3", (c + 1).toDouble))
    }
    spark.createDataFrame(rows).toDF("cell_id", "category", "substance", "value")
  }

  def collectSet[T](df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  def totalsBySub(df: DataFrame): Map[(String, String), Double] =
    df.groupBy("category", "substance")
      .sum("value")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
}
