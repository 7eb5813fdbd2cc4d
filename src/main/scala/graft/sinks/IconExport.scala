package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.profiles.Profiles

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
}
