package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Driver-side parquet schema resolution for lifecycle relations.
  *
  * `spark.read.parquet(paths…)` launches a schema-INFERENCE job (a
  * distributed footer read) before the real scan — one extra Spark job
  * plus its scheduling latency per read, which the lifecycle gates pay
  * 5-10× per call (tombstones, tails, generations, stats). The
  * lifecycle relations are single-writer and schema-homogeneous by
  * construction (every file of a relation is written by the same
  * operator), so ONE footer read on the driver — through the same
  * [[org.apache.spark.sql.execution.datasources.parquet.ParquetToSparkSchemaConverter]]
  * Spark's own inference uses — yields the identical schema, and
  * passing it via `.schema(...)` skips the inference job entirely.
  * The footer read uses SKIP_ROW_GROUPS (schema bytes only).
  *
  * This is a serve-path latency fix, not a local-mode trick: on an
  * object store each avoided inference job is a driver-blocking
  * round-trip per query batch (optimization guide §7.3's "nothing is
  * running" driver time).
  */
object ParquetIO {

  /** `spark.read.parquet(paths…)` with the schema taken from the first
    * footer, read on the driver — no schema-inference job. Only for
    * relations whose files share one schema (all lifecycle relations). */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "ParquetIO.read needs at least one path")
    spark.read.schema(schemaOf(spark, paths)).parquet(paths: _*)
  }

  /** The Spark schema of the first parquet file found under `paths`
    * (each entry a file or a directory), resolved from its footer on
    * the driver. */
  def schemaOf(spark: SparkSession, paths: Seq[String]): StructType = {
    val conf = spark.sparkContext.hadoopConfiguration
    val first = paths.iterator.flatMap { s =>
      val p = new Path(s)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Iterator.empty
      else if (fs.getFileStatus(p).isFile) Iterator.single(p)
      else fs.listStatus(p).iterator
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(_.getPath)
    }.find(_ => true)
    val p = first.getOrElse(throw new IllegalArgumentException(
      s"no parquet file under ${paths.head} (… ${paths.length} paths)"))
    val footer = org.apache.spark.sql.execution.datasources.parquet
      .ParquetFooterReader.readFooter(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf),
        org.apache.parquet.format.converter.ParquetMetadataConverter
          .SKIP_ROW_GROUPS)
    new org.apache.spark.sql.execution.datasources.parquet
      .ParquetToSparkSchemaConverter(
        org.apache.spark.sql.internal.SQLConf.get)
      .convert(footer.getFileMetaData.getSchema)
  }
}
