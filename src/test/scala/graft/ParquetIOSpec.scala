package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.ParquetIO

/** The driver-side footer-schema reads that replace schema-inference
  * jobs on every lifecycle relation (r21) assume the single-writer
  * homogeneity contract; r22 turns that assumption into an ASSERTED
  * guard (first vs last footer) so an evolved relation fails loudly
  * instead of silently projecting the stale first-file schema. */
class ParquetIOSpec extends SparkSpec {

  private def tmpDir: String =
    Files.createTempDirectory("graft-pio").toString

  test("schemaOf resolves the footer schema without a Spark job") {
    val dir = s"$tmpDir/t"
    spark.range(10).select(col("id"), (col("id") * 2).as("v"))
      .coalesce(1).write.parquet(dir)
    val s = ParquetIO.schemaOf(spark, Seq(dir))
    assert(s.fieldNames.toSeq == Seq("id", "v"))
    assert(ParquetIO.read(spark, Seq(dir)).count() == 10)
    assert(ParquetIO.rowCountOf(spark, Seq(dir)) == 10L)
  }

  test("column-order differences between generations do NOT trip the guard") {
    // the lifecycle legitimately reorders columns (a consolidate's
    // anti-join emits the join key first); parquet reads resolve by name
    val dir = tmpDir
    spark.range(5).select(col("id"), (col("id") * 2).as("v"))
      .coalesce(1).write.parquet(s"$dir/gen-0")
    spark.range(5).select((col("id") * 2).as("v"), col("id"))
      .coalesce(1).write.parquet(s"$dir/gen-1")
    val s = ParquetIO.schemaOf(spark, Seq(s"$dir/gen-0", s"$dir/gen-1"))
    assert(s.fieldNames.toSet == Set("id", "v"))
  }

  test("a schema-divergent file in the relation fails LOUDLY, not as nulls") {
    val dir = tmpDir
    spark.range(5).select(col("id"), (col("id") * 2).as("v"))
      .coalesce(1).write.parquet(s"$dir/gen-0")
    // a later "generation" that evolved the schema (gained a column) —
    // the contract violation the guard exists for
    spark.range(5).select(col("id"), (col("id") * 2).as("v"),
      lit("x").as("extra"))
      .coalesce(1).write.parquet(s"$dir/gen-1")
    val genFiles = Seq(s"$dir/gen-0", s"$dir/gen-1")
    val e = intercept[IllegalStateException] {
      ParquetIO.schemaOf(spark, genFiles)
    }
    assert(e.getMessage.contains("schema-homogeneity"))
    // type change is caught too
    val dir2 = tmpDir
    spark.range(5).select(col("id"), (col("id") * 2).as("v"))
      .coalesce(1).write.parquet(s"$dir2/gen-0")
    spark.range(5).select(col("id"), (col("id") * 2).cast("string").as("v"))
      .coalesce(1).write.parquet(s"$dir2/gen-1")
    intercept[IllegalStateException] {
      ParquetIO.schemaOf(spark, Seq(s"$dir2/gen-0", s"$dir2/gen-1"))
    }
  }

  test("nullability-only differences between writers do NOT trip the guard") {
    val dir = tmpDir
    // non-null writer (aggregation output: parquet 'required')
    spark.range(5).groupBy(col("id")).agg(count(lit(1)).as("n"))
      .coalesce(1).write.parquet(s"$dir/gen-0")
    // nullable writer of the same logical relation
    spark.range(5).select(col("id"),
      when(col("id") >= 0, col("id")).as("n"))
      .coalesce(1).write.parquet(s"$dir/gen-1")
    val s = ParquetIO.schemaOf(spark, Seq(s"$dir/gen-0", s"$dir/gen-1"))
    assert(s.fieldNames.toSeq == Seq("id", "n"))
  }
}
