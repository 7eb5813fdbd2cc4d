package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.profiles.Profiles
import graft.sources.NetcdfClassic.{NcAtt, NcDim, NcInt, NcDouble}
import graft.sinks.NetcdfWriter.{WriteVar, textAtt}

/** ICON-OEM-style export building blocks (reference `export_icon_oem`,
  * emiproc/exports/icon.py:92-370): cells are grouped into "profile
  * regions" (identical per-category profile vectors), each region gets
  * per-kind scaling-factor vectors, and local-time regions apply the
  * reference's `np.roll` timezone shift (icon.py:514-518) — here a
  * modular position shift, not an array rotate.
  */
object IconExport {

  /** Region table: distinct per-cell profile assignment → dense region id
    * (the reference's `group_profile_cells_by_regions`). */
  def regions(index: DataFrame): DataFrame = Profiles.groupCellsByRegions(index)

  /** Timezone roll: shift a cyclic profile's positions by `shiftHours`
    * (UTC profile evaluated in local time) — `np.roll(ratios, shift)`
    * becomes `pos' = (pos + shift) mod size`. */
  def tzRoll(profiles: DataFrame, shiftHours: Int, size: Int = 24): DataFrame =
    profiles.select(
      col("profile_id"),
      pmod(col("pos") + shiftHours, lit(size)).as("pos"),
      col("ratio"))

  /** Per-region scaling factors: join the region's profile and scale
    * ratios by the kind size (factor 1.0 == flat), rolled into the
    * region's timezone. `regionTz(region_id, profile_id, tz_shift)`. */
  def regionScalingFactors(
      spark: SparkSession,
      regionTz: DataFrame,
      profiles: DataFrame, // (profile_id, pos, ratio), cyclic of `size`
      size: Int = 24): DataFrame =
    regionTz
      .join(profiles, "profile_id")
      .select(
        col("region_id"),
        pmod(col("pos") + col("tz_shift"), lit(size)).as("pos"),
        (col("ratio") * size).as("sf"))

  /** End-to-end OEM time-profile assembly — the reference's
    * `make_icon_time_profiles` (emiproc/exports/icon.py:384-547): for
    * every export variable (cat, sub) and every OEM "country" (= profile
    * region), the per-kind scaling-factor vectors
    * `sf = ratio × kind_size`, with the hour-resolved kinds
    * (`hourofday`, `hourofyear`) rolled into the region's timezone —
    * `np.roll(sf, -tz_shift)` (icon.py:512-518) ⇒ long-format
    * `pos' = (pos − tz_shift) mod size`. THREE_CYCLES mode = profiles
    * carrying {hour_of_day, day_of_week, month}; HOUR_OF_YEAR mode =
    * an `hour_of_year` profile sized by the reference's year%4 leap rule
    * (profiles.py:277-284 via `get_leap_year_or_normal`, icon.py:426).
    *
    * Inputs (long format): `catsubs(category, substance, var)`,
    * `indexes(category, substance, tpid, profile_id)` — the profile
    * index cube with its region dimension keyed by the region's
    * `temporal_profile_id` (icon.py:498-505); `regions(region_id, tpid,
    * tz_shift)`; `profiles(profile_id, kind, pos, ratio)`.
    * Output: `(var, kind, region_id, pos, sf)` — one row per matrix
    * entry of the reference's per-kind datasets. Everything broadcasts
    * except the profile join; no fact data involved. */
  def assembleTimeProfiles(
      spark: SparkSession,
      catsubs: DataFrame,
      indexes: DataFrame,
      regions: DataFrame,
      profiles: DataFrame,
      year: Int = 2023): DataFrame = {
    val leap = year % 4 == 0 // reference's documented year%4-only rule
    val size = when(col("kind") === "month", 12.0)
      .when(col("kind") === "day_of_week", 7.0)
      .when(col("kind") === "hour_of_day", 24.0)
      .when(col("kind") === "hour3_of_day", 8.0)
      .when(col("kind") === "day_of_year", if (leap) 366.0 else 365.0)
      .when(col("kind") === "hour_of_year", if (leap) 8784.0 else 8760.0)
    val rolled = when(col("kind").isin("hour_of_day", "hour_of_year"),
      pmod(col("pos") - col("tz_shift"), col("_size").cast("int")))
      .otherwise(col("pos"))
    catsubs
      .join(indexes, Seq("category", "substance"))
      .join(regions, "tpid")
      .join(profiles, "profile_id")
      .withColumn("_size", size)
      .select(
        col("var"), col("kind"), col("region_id"),
        rolled.as("pos"),
        (col("ratio") * col("_size")).as("sf"))
  }

  /** Write the assembled profiles as the per-kind file set the OEM
    * export produces (hourofday/dayofweek/monthofyear or hourofyear) —
    * parquet partitioned by kind; the reference writes NetCDF
    * (icon.py:540-546), out of scope without a NetCDF encoder (see
    * FIXTURES.md), with identical table content. */
  def writeOemProfiles(assembled: DataFrame, outDir: String): Unit =
    assembled.write.mode("overwrite").partitionBy("kind").parquet(outDir)

  /** Write the assembled OEM profiles as REAL NetCDF classic files — the
    * reference's `make_icon_time_profiles` `to_netcdf` endpoint
    * (emiproc/exports/icon.py:524-546): one `<kind>.nc` per kind
    * (hourofday/dayofweek/monthofyear or hourofyear), each holding one
    * NC_DOUBLE variable per export var with dims `(kind, country)` and
    * `units="1"` / `long_name="<kind> scaling factors for <var>"`
    * (icon.py:484-487), plus the coordinate block icon.py:528-536:
    * `country` (dense ints), `temporal_profile_id`, and — when the
    * region table carries them — `timezone_of_country` / `region_key`
    * NC_CHAR matrices.
    *
    * `assembled` = output of [[assembleTimeProfiles]] `(var, kind,
    * region_id, pos, sf)`; `regions` = `(region_id, tpid[, tz_name,
    * region_key])`. Profile matrices are metadata-scale (kinds × regions
    * × vars), so the collect is bounded by construction. */
  def writeOemNc(
      assembled: DataFrame,
      regions: DataFrame,
      outDir: String,
      atts: Seq[NcAtt] = Nil): Seq[String] = {
    val kindDim = Map(
      "hour_of_day" -> "hourofday", "day_of_week" -> "dayofweek",
      "month" -> "monthofyear", "hour_of_year" -> "hourofyear")
    val regRows = regions
      .withColumn("region_id", col("region_id").cast("long"))
      .withColumn("tpid", col("tpid").cast("long"))
      .orderBy("region_id").collect()
    val nReg = regRows.length
    val regIdx = regRows.map(_.getAs[Long]("region_id")).zipWithIndex.toMap
    val hasTz = regions.columns.contains("tz_name")
    val hasKey = regions.columns.contains("region_key")
    val all = assembled
      .withColumn("region_id", col("region_id").cast("long"))
      .withColumn("pos", col("pos").cast("int"))
      .withColumn("sf", col("sf").cast("double"))
      .collect()
    val written = scala.collection.mutable.ArrayBuffer.empty[String]
    all.groupBy(_.getAs[String]("kind")).toSeq.sortBy(_._1).foreach {
      case (kind, rows) =>
        val dimName = kindDim.getOrElse(kind, kind.replace("_", ""))
        val size = rows.map(_.getAs[Int]("pos")).max + 1
        val varNames = rows.map(_.getAs[String]("var")).distinct.sorted
        val mats = varNames.map(v => v -> new Array[Double](size * nReg)).toMap
        rows.foreach { r =>
          val i = r.getAs[Int]("pos") * nReg + regIdx(r.getAs[Long]("region_id"))
          mats(r.getAs[String]("var"))(i) = r.getAs[Double]("sf")
        }
        val strLen = 32
        val dims = Seq(NcDim(dimName, size), NcDim("country", nReg),
          NcDim("str_len", strLen))
        val coords = Seq(
          WriteVar("country", Seq("country"), NcInt,
            doubles = Array.tabulate(nReg)(_.toDouble)),
          WriteVar("temporal_profile_id", Seq("country"), NcInt,
            doubles = regRows.map(_.getAs[Long]("tpid").toDouble))) ++
          (if (hasTz) Seq(WriteVar("timezone_of_country",
            Seq("country", "str_len"), graft.sources.NetcdfClassic.NcChar,
            strings = regRows.map(_.getAs[String]("tz_name")).toSeq)) else Nil) ++
          (if (hasKey) Seq(WriteVar("region_key",
            Seq("country", "str_len"), graft.sources.NetcdfClassic.NcChar,
            strings = regRows.map(_.getAs[String]("region_key")).toSeq)) else Nil)
        val dataVars = varNames.map { v =>
          WriteVar(v, Seq(dimName, "country"), NcDouble,
            atts = Seq(textAtt("units", "1"),
              textAtt("long_name", s"$dimName scaling factors for $v")),
            doubles = mats(v))
        }
        val gatts = if (atts.nonEmpty) atts
          else Exports.ncCfAttrs(s"${dimName.capitalize} profiles")
        Exports.writeBytes(s"$outDir/$dimName.nc",
          NetcdfWriter.write(dims, gatts, coords ++ dataVars))
        written += s"$dimName.nc"
    }
    written.toSeq
  }

  /** Vertical profiles as a real `vertical_profiles.nc` — the
    * reference's `make_icon_vertical_profiles`
    * (emiproc/exports/icon.py:549-590): one NC_DOUBLE variable per
    * category over dim `level` with `units="1"`, plus `layer_top` (the
    * resampled heights), `layer_bot` (heights rolled down, first = 0)
    * and `layer_mid` (their midpoint). All categories must share the
    * height axis — resample first with `VerticalProfiles.resample`.
    *
    * `vertical` = `(category, level, r)` long table; `heights` = top
    * edge per level index (ascending). */
  def writeVerticalNc(
      vertical: DataFrame,
      heights: Seq[Double],
      outDir: String,
      atts: Seq[NcAtt] = Nil): Unit = {
    val n = heights.length
    val rows = vertical
      .withColumn("level", col("level").cast("int"))
      .withColumn("r", col("r").cast("double"))
      .collect()
    val cats = rows.map(_.getAs[String]("category")).distinct.sorted
    val mats = cats.map(c => c -> new Array[Double](n)).toMap
    rows.foreach { r =>
      mats(r.getAs[String]("category"))(r.getAs[Int]("level")) =
        r.getAs[Double]("r")
    }
    val layerBot = 0.0 +: heights.dropRight(1)
    val dims = Seq(NcDim("level", n))
    val catVars = cats.map { c =>
      WriteVar(c, Seq("level"), NcDouble,
        atts = Seq(
          textAtt("long_name", s"vertical scaling factor for sources of $c category "),
          textAtt("units", "1")),
        doubles = mats(c))
    }
    val layers = Seq(
      WriteVar("layer_top", Seq("level"), NcDouble, doubles = heights.toArray),
      WriteVar("layer_bot", Seq("level"), NcDouble, doubles = layerBot.toArray),
      WriteVar("layer_mid", Seq("level"), NcDouble,
        doubles = heights.zip(layerBot).map { case (t, b) => (t + b) / 2.0 }.toArray))
    val gatts = if (atts.nonEmpty) atts else Exports.ncCfAttrs("Vertical profiles")
    Exports.writeBytes(s"$outDir/vertical_profiles.nc",
      NetcdfWriter.write(dims, gatts, catVars.toSeq ++ layers))
  }

  /** K8 — standalone profile export (reference
    * `export_inventory_profiles`, emiproc/exports/profiles.py:22-121:
    * vertical profiles + ICON-style temporal profiles written as their
    * own file set, without the emission export): vertical ratio table
    * under `<dir>/vertical`, temporal per-kind set under
    * `<dir>/temporal` via [[writeOemProfiles]]. */
  def exportInventoryProfiles(
      vertical: DataFrame, // (profile_id, level, r)
      assembledTemporal: DataFrame, // output of assembleTimeProfiles
      outDir: String): Unit = {
    vertical.write.mode("overwrite").parquet(s"$outDir/vertical")
    writeOemProfiles(assembledTemporal, s"$outDir/temporal")
  }
}
