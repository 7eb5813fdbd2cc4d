package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's DuckDB-backed inventory, Spark-native (reference
  * `DuckDBInventory`, emiproc/inventories/zurich/duck.py:23-155):
  * one TABLE per category, `emission_<substance>` value columns, a WKB
  * geometry column and a year column.
  *
  * The reference opens the `.duckdb` container through the duckdb
  * client; the lakehouse-native form of the same database is duckdb's
  * own parquet export (`EXPORT DATABASE '<dir>' (FORMAT PARQUET)` —
  * one `<table>.parquet` per table, WKB via `ST_AsWKB`). This loader
  * reads that directory with identical semantics:
  *
  *  - tables ending in a `skipSuffixes` entry are skipped
  *    (duck.py:104,135-137: `_ef`, `_p` side tables);
  *  - rows filter on `yearColumn == year` (duck.py:39-45) — a plain
  *    pushed-down parquet predicate here;
  *  - `emission_` prefixes strip to substance names (duck.py:76-78);
  *  - missing emission values fill 0.0 (duck.py:79);
  *  - geometry decodes through the byte-level [[Wkb]] codec into the
  *    engine's vertex-array parts.
  *
  * Output: `emissions(category, source_id, substance, value)` long
  * format and `geoms(category, source_id, kind, part, ring, xs, ys)` —
  * the `(gdfs)` shape every downstream operator (poly weights, crop,
  * remap) already consumes. Scale: one distributed parquet scan per
  * category table plus one balanced shuffle (64-bit content-hash key)
  * for the duplicate-row rank; geometry decode is a narrow per-row
  * kernel, nothing collects on the driver.
  */
object DuckInventory {

  final case class Loaded(emissions: DataFrame, geoms: DataFrame)

  private val wkbPartsUdf = udf((bytes: Array[Byte]) => {
    val g = Wkb.decode(bytes)
    g.parts.map(p => (g.kind, p.part, p.ring, p.xs.toSeq, p.ys.toSeq))
  })

  def read(
      spark: SparkSession,
      dir: String,
      year: Int,
      skipSuffixes: Seq[String] = Seq("_ef", "_p"),
      geometryColumn: String = "geom",
      yearColumn: String = "jahr"): Loaded = {
    val d = new java.io.File(dir)
    require(d.isDirectory, s"$dir is not a directory")
    val tables = d.listFiles().toSeq
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName.stripSuffix(".parquet"), f.getPath))
      .filterNot { case (name, _) => skipSuffixes.exists(name.endsWith) }
      .sortBy(_._1)
    require(tables.nonEmpty, s"no category tables in $dir")

    val perTable = tables.map { case (category, path) =>
      val raw = spark.read.parquet(path)
      require(raw.columns.contains(geometryColumn),
        s"Geometry column '$geometryColumn' not found in table '$category'.")
      val emissionCols = raw.columns.filter(_.startsWith("emission_")).sorted
      // deterministic per-source id playing the reference's pandas row
      // index role (duck.py keys each row uniquely). A pure content hash
      // would collapse byte-identical duplicate rows (two equal road
      // segments are plausible inventory data) and the downstream
      // emissions↔geoms join on (category, source_id) would then
      // cross-multiply them (k duplicates → k² joined rows, inflating
      // totals). Disambiguate with a rank within each content-hash
      // group: the window partitions by a 64-bit hash, so groups are
      // size ~1 (only true duplicates are larger) — one balanced
      // shuffle per table, no global window, still deterministic.
      val dupW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("_chash")).orderBy(col("_chash"))
      val withId = raw
        .where(col(yearColumn) === year)
        .withColumn("_chash",
          xxhash64((geometryColumn +: emissionCols.toSeq).map(col): _*))
        .withColumn("source_id",
          xxhash64(col("_chash"), row_number().over(dupW)))
        .drop("_chash")
      val emissions = emissionCols.map { c =>
        withId.select(
          lit(category).as("category"), col("source_id"),
          lit(c.stripPrefix("emission_")).as("substance"),
          coalesce(col(c).cast("double"), lit(0.0)).as("value"))
      }.reduce(_ unionByName _)
      val geoms = withId
        .select(lit(category).as("category"), col("source_id"),
          explode(wkbPartsUdf(col(geometryColumn))).as("g"))
        .select(col("category"), col("source_id"),
          col("g._1").as("kind"), col("g._2").as("part"),
          col("g._3").as("ring"), col("g._4").as("xs"), col("g._5").as("ys"))
      (emissions, geoms)
    }
    Loaded(
      perTable.map(_._1).reduce(_ unionByName _),
      perTable.map(_._2).reduce(_ unionByName _))
  }
}
