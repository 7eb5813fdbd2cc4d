package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dialect-tolerant CSV profile readers — the reference accepts `,`, `;`
  * or tab separators with `#` comments (emiproc/profiles/utils.py:242-268)
  * and vertical-profile headers of height intervals like `20m` / `12-23`
  * (emiproc/profiles/vertical_profiles.py:254-399).
  *
  * Profile CSVs are tiny (metadata-scale, not data-scale): the dialect
  * sniff reads one line on the driver; the parse itself is a normal
  * `spark.read.csv` so the same code path handles a 10-row file and a
  * 10M-row profile dump.
  */
object ProfilesCsv {

  /** Detect the separator from the first non-comment line. */
  private[sources] def sniffSep(spark: SparkSession, path: String): String = {
    val first = spark.read.textFile(path)
      .filter(not(col("value").startsWith("#")))
      .head()
    Seq("\t", ";", ",").maxBy(s => first.split(java.util.regex.Pattern.quote(s), -1).length)
  }

  /** Read a wide temporal-profile CSV `name, r0, r1, …` (any dialect) into
    * long `(profile_name, pos, ratio)`, ratios normalized to sum 1 per
    * profile — the reference's read_temporal_profiles semantics
    * (emiproc/profiles/temporal/io.py:91-209). */
  def readTemporalProfiles(spark: SparkSession, path: String): DataFrame = {
    val sep = sniffSep(spark, path)
    val raw = spark.read
      .option("header", "true").option("sep", sep).option("comment", "#")
      .option("inferSchema", "false")
      .csv(path)
    val nameCol = raw.columns.head
    val ratioCols = raw.columns.tail
    val long = raw.select(
      col(nameCol).as("profile_name"),
      posexplode(array(ratioCols.map(c => col(c).cast("double")): _*)))
      .withColumnRenamed("pos", "pos0")
      .select(col("profile_name"), col("pos0").as("pos"), col("col").as("w"))
    val win = org.apache.spark.sql.expressions.Window.partitionBy("profile_name")
    long.select(
      col("profile_name"), col("pos"),
      (col("w") / sum("w").over(win)).as("ratio"))
  }

  /** Parse a height header token: `20m` → 20.0 ; `12-23` → 23.0 (interval
    * top edge) — reference emiproc/profiles/vertical_profiles.py:254-399. */
  private[sources] def heightTop(token: String): Double = {
    val t = token.trim.stripSuffix("m")
    val part = t.split("-").last
    part.toDouble
  }

  /** Read a vertical-profile CSV `Category,Substance,20m,92m,…` into long
    * `(category, substance, level, height_top, ratio)`. */
  def readVerticalProfiles(spark: SparkSession, path: String): DataFrame = {
    val sep = sniffSep(spark, path)
    val raw = spark.read
      .option("header", "true").option("sep", sep).option("comment", "#")
      .csv(path)
    val keyCols = raw.columns.take(2)
    val levelCols = raw.columns.drop(2)
    val tops = levelCols.map(heightTop)
    require(tops.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
      s"height headers not strictly increasing: ${levelCols.mkString(",")}")
    val topArr = array(tops.map(lit): _*)
    raw.select(
      col(keyCols(0)).as("category"),
      col(keyCols(1)).as("substance"),
      posexplode(array(levelCols.map(c => col(c).cast("double")): _*)))
      .select(
        col("category"), col("substance"),
        col("pos").as("level"),
        element_at(topArr, col("pos") + 1).as("height_top"),
        col("col").as("ratio"))
  }
}
