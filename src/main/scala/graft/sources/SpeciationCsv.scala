package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Speciation-table CSV reader — reference `read_speciation_table`
  * (emiproc/speciation.py:22-108):
  *
  * {{{
  * # comment lines starting with # are ignored
  * category,country,substance0,substance1,...
  * cat0,c0,0.5,0.2,...
  * }}}
  *
  * Reserved (optional) dimension columns: `category`, `country` (ISO3,
  * `-99` = default/homeless rule), `type` (gridded|shapped), `year`;
  * every other column is a speciated substance whose cells hold the
  * mass-fraction ratio. Ratios of each row must sum to 1 (`check_sum`,
  * speciation.py:96-104); `dropZeros` removes all-zero rows (`:92-94`).
  *
  * Output is LONG format — the optional dims present in the file, plus
  * `(new_substance, ratio)` — ready for
  * [[graft.ops.Speciation.speciateFromTable]].
  */
object SpeciationCsv {

  val ReservedCols: Seq[String] = Seq("category", "country", "type", "year")

  def read(
      spark: SparkSession,
      path: String,
      checkSum: Boolean = true,
      dropZeros: Boolean = false,
      tol: Double = 1e-6): DataFrame = {
    val raw0 = spark.read
      .option("header", "true")
      .option("comment", "#")
      .csv(path)
    val dims = raw0.columns.filter(ReservedCols.contains).toSeq
    val subs = raw0.columns.filterNot(ReservedCols.contains).toSeq
    require(subs.nonEmpty, s"no substance columns in $path (all reserved)")

    var raw = subs.foldLeft(raw0)((df, s0) => df.withColumn(s0, col(s0).cast("double")))
    if (dims.contains("year")) raw = raw.withColumn("year", col("year").cast("int"))

    val rowSum = subs.map(col).reduce(_ + _)
    raw = raw.withColumn("_rowsum", rowSum)
    if (dropZeros) raw = raw.where(col("_rowsum") =!= 0.0)
    if (checkSum) {
      // bounded driver-side check (10 rows) — validation, not a hot path
      val bad = raw.where(abs(col("_rowsum") - 1.0) > tol).limit(10).collect()
      require(bad.isEmpty,
        s"speciation ratios must sum to 1 (speciation.py:96-104); offending " +
          s"rows: ${bad.mkString("; ")} — pass checkSum=false to skip")
    }
    raw.select(
      dims.map(col) :+
        explode(array(subs.map(s0 =>
          struct(lit(s0).as("new_substance"), col(s0).as("ratio"))): _*)).as("p"): _*)
      .select(dims.map(col) :+ col("p.new_substance") :+ col("p.ratio"): _*)
  }
}
