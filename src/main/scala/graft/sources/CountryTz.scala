package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S13 — the TNO country→timezone reference table (reference data file
  * `files/profiles/tno/country_tz.csv`; the country shapes themselves
  * come through [[Shapefile.countryPolygons]], mirroring
  * `emiproc/utilities.py:263-314` get_natural_earth).
  *
  * Layout: `#`-comment preamble then a `;`-separated table
  * `iso3; country; timezone; summertime; timezone_flag; sea` with
  * space-padded cells. Parsed fully declaratively (`spark.read.csv`
  * with comment + header options, trim/cast projection) — the file is
  * reference data (≈300 rows), but the read path is the same distributed
  * csv scan any sized table would use.
  */
object CountryTz {

  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("sep", ";").option("comment", "#").option("header", "true")
      .csv(path)
    val named = raw.select(raw.columns.map(c => col(s"`$c`").as(c.trim)): _*)
    named.select(
      trim(col("iso3")).as("iso3"),
      trim(col("country")).as("country"),
      trim(col("timezone")).cast("int").as("tz_hours"),
      trim(col("summertime")).cast("int").as("summertime"),
      trim(col("timezone_flag")).cast("int").as("tz_flag"),
      trim(col("sea")).cast("int").as("sea"))
  }
}
