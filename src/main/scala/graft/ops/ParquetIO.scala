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

  /** Total row count of the parquet files under `paths` (files or
    * directories), summed from footer block metadata on the DRIVER —
    * no Spark job, no data pages read. Replaces the maintenance
    * passes' `df.count()` (a full distributed pass over rows the very
    * next statement re-reads to write): parquet row counts are exact
    * footer facts, so the number is identical by construction. One
    * footer round-trip per file — the file sets here are maintenance
    * snapshots (tails, generations), already listed by the caller's
    * pass and bounded by the lifecycle's own compaction. */
  def rowCountOf(spark: SparkSession, paths: Seq[String]): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    paths.iterator.flatMap { s =>
      val p = new Path(s)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Iterator.empty
      else if (fs.getFileStatus(p).isFile) Iterator.single(p)
      else fs.listStatus(p).iterator
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(_.getPath)
    }.map { f =>
      val footer = org.apache.spark.sql.execution.datasources.parquet
        .ParquetFooterReader.readFooter(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf),
          org.apache.parquet.format.converter.ParquetMetadataConverter
            .NO_FILTER)
      import scala.jdk.CollectionConverters._
      footer.getBlocks.asScala.iterator.map(_.getRowCount).sum
    }.sum
  }

  /** The Spark schema of the first parquet file found under `paths`
    * (each entry a file or a directory), resolved from its footer on
    * the driver — GUARDED by a second footer read of the LAST file:
    * the single-writer homogeneity contract is asserted, not assumed,
    * so a lifecycle relation that ever evolves its schema (a later
    * generation gaining a column, a type change) fails LOUDLY here
    * instead of silently projecting the stale first-file schema (added
    * columns read as null, dropped ones as decode errors). Two driver
    * footer reads instead of one — still no Spark job, no distributed
    * inference pass; nullability is NOT compared (parquet
    * required/optional varies with the writing plan's nullability
    * inference and Spark relaxes it on read anyway). A first/last probe
    * cannot catch a divergent MIDDLE file, but every schema evolution
    * under the append-only lifecycle changes the newest file — which is
    * exactly one of the two probed. */
  def schemaOf(spark: SparkSession, paths: Seq[String]): StructType = {
    val conf = spark.sparkContext.hadoopConfiguration
    def filesOf(s: String): Seq[Path] = {
      val p = new Path(s)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Seq.empty
      else if (fs.getFileStatus(p).isFile) Seq(p)
      else fs.listStatus(p).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(_.getPath)
    }
    // first file of the first nonempty path, last file of the last —
    // at most two directory listings regardless of path count
    val first = paths.iterator.flatMap(p => filesOf(p).headOption)
      .find(_ => true)
    val p = first.getOrElse(throw new IllegalArgumentException(
      s"no parquet file under ${paths.head} (… ${paths.length} paths)"))
    val last = paths.reverseIterator.flatMap(p => filesOf(p).lastOption)
      .find(_ => true).get
    def footerSchema(f: Path): StructType = {
      val footer = org.apache.spark.sql.execution.datasources.parquet
        .ParquetFooterReader.readFooter(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf),
          org.apache.parquet.format.converter.ParquetMetadataConverter
            .SKIP_ROW_GROUPS)
      new org.apache.spark.sql.execution.datasources.parquet
        .ParquetToSparkSchemaConverter(
          org.apache.spark.sql.internal.SQLConf.get)
        .convert(footer.getFileMetaData.getSchema)
    }
    // nullability-blind at EVERY nesting level (array containsNull,
    // struct-field nullability): parquet required/optional tracks the
    // writing plan, not the logical relation
    def sameType(a: org.apache.spark.sql.types.DataType,
        b: org.apache.spark.sql.types.DataType): Boolean = (a, b) match {
      case (x: StructType, y: StructType) =>
        x.fields.length == y.fields.length &&
          x.fields.zip(y.fields).forall { case (f, g) =>
            f.name == g.name && sameType(f.dataType, g.dataType) }
      case (x: org.apache.spark.sql.types.ArrayType,
          y: org.apache.spark.sql.types.ArrayType) =>
        sameType(x.elementType, y.elementType)
      case (x: org.apache.spark.sql.types.MapType,
          y: org.apache.spark.sql.types.MapType) =>
        sameType(x.keyType, y.keyType) && sameType(x.valueType, y.valueType)
      case _ => a == b
    }
    val schema = footerSchema(p)
    if (last != p) {
      val lastSchema = footerSchema(last)
      // column-ORDER-insensitive: parquet resolves read columns BY
      // NAME, and the lifecycle legitimately reorders columns between
      // generations (a consolidate's anti-join emits the join key
      // first) — only a changed column SET or a changed type is a
      // contract violation
      def byName(s: StructType) = s.fields.sortBy(_.name)
      val a = byName(schema)
      val b = byName(lastSchema)
      val same = a.length == b.length && a.zip(b).forall { case (f, g) =>
        f.name == g.name && sameType(f.dataType, g.dataType) }
      if (!same) throw new IllegalStateException(
        s"schema-homogeneity contract violated under ${paths.head} (… " +
          s"${paths.length} paths): first file $p reads as " +
          s"${schema.simpleString} but last file $last reads as " +
          s"${lastSchema.simpleString}; lifecycle relations are " +
          "single-writer single-schema by contract — refusing the " +
          "silent stale-schema projection")
    }
    schema
  }
}
