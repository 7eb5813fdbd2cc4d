package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EDGAR auxiliary temporal-profile files (reference
  * `emiproc/inventories/edgar/temporal.py:26-171` +
  * `read_profile_file`, emiproc/profiles/utils.py:242-262):
  *
  *  - `weekly_profiles.csv` — per (country, category) daily factors over
  *    Weekday_id 1–7 → a WeeklyProfile per pair;
  *  - `hourly_profiles.csv` + `weekenddays.csv` + `weekdays.csv` — hourly
  *    factors per (country, category, month, Daytype_id), where each
  *    country's weekend TYPE decides which day type each day of week
  *    uses (Fri/Sat vs Sat/Sun weekends…), composed into a 2016-slot
  *    HourOfWeekPerMonth profile: pos = (month−1)·168 + (dow−1)·24 +
  *    hour, normalized per (country, category) over all present slots
  *    (temporal.py:165-167).
  *
  * The reference pivots and concatenates DataArrays month × day in a
  * driver loop; here the same composition is three joins and one
  * normalizing window — the profile tables are reference-data-sized, but
  * the shape is the one that would hold if they weren't.
  *
  * `read_profile_file`'s separator tolerance (`;`, tab or comma, `#`
  * comments) is mirrored by sniffing the first non-comment line.
  */
object EdgarProfiles {

  /** Separator sniff: the reference's regex sep `;|\t|,`. */
  private[graft] def sniffSep(path: String): String = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try {
      val line = src.getLines().find(l => !l.startsWith("#") && l.nonEmpty)
        .getOrElse(throw new IllegalArgumentException(s"$path: no data lines"))
      Seq(";", "\t", ",").maxBy(s => line.count(_ == s.charAt(0)))
    } finally src.close()
  }

  /** Any profile csv: comment lines skipped, sniffed separator, header. */
  def readProfileFile(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", sniffSep(path)).option("comment", "#")
      .option("header", "true")
      .csv(path)

  /** weekly_profiles.csv → `(country, category, dow0, ratio)`,
    * Monday = 0 (Weekday_id 1–7, temporal.py:38-45). */
  def weeklyProfiles(spark: SparkSession, dir: String): DataFrame =
    readProfileFile(spark, s"$dir/weekly_profiles.csv")
      .select(
        trim(col("Country_code_A3")).as("country"),
        trim(col("activity_code")).as("category"),
        (col("Weekday_id").cast("int") - 1).as("dow0"),
        col("daily_factor").cast("double").as("ratio"))

  /** hourly_profiles.csv (+ weekend definitions) → the composed
    * HourOfWeekPerMonth long rows `(country, category, pos, ratio)`,
    * ratio normalized per (country, category). */
  def hourOfWeekPerMonthProfiles(spark: SparkSession, dir: String): DataFrame = {
    val hourly0 = readProfileFile(spark, s"$dir/hourly_profiles.csv")
    val hourCols = (1 to 24).map(i => s"h$i")
    val hourly = hourly0.select(
      trim(col("Country_code_A3")).as("country"),
      trim(col("activity_code")).as("category"),
      col("month_id").cast("int").as("month"),
      col("Daytype_id").cast("int").as("daytype"),
      posexplode(array(hourCols.map(c => col(c).cast("double")): _*))
        .as(Seq("hour0", "factor")))
    val countryType = readProfileFile(spark, s"$dir/weekenddays.csv")
      .select(trim(col("Country_code_A3")).as("country"),
        col("Weekend_type_id").cast("int").as("wtype"))
    val dayMap = readProfileFile(spark, s"$dir/weekdays.csv")
      .select(col("Weekend_type_id").cast("int").as("wtype"),
        (col("Weekday_id").cast("int") - 1).as("dow0"),
        col("Daytype_id").cast("int").as("daytype"))
    // (country, dow0) -> daytype via the country's weekend type
    val countryDow = countryType.join(broadcast(dayMap), "wtype")
      .select("country", "dow0", "daytype")
    val positioned = hourly
      .join(broadcast(countryDow), Seq("country", "daytype"))
      .select(col("country"), col("category"),
        ((col("month") - 1) * 168 + col("dow0") * 24 + col("hour0")).as("pos"),
        col("factor"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("country", "category")
    positioned
      .withColumn("ratio", col("factor") / sum("factor").over(w))
      .select("country", "category", "pos", "ratio")
  }
}
