package graft.profiles

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vertical (height-interval) profile operations — reference
  * emiproc/profiles/vertical_profiles.py.
  *
  * Conservative 1-D interval regrid (`resample_vertical_profiles` +
  * `get_weights_profiles_interpolation`, reference :140-218): the 1-D
  * version of the box-overlap weight join. Level tables are tiny —
  * the overlap join is a broadcast nested loop filtered to overlap > 0,
  * then one aggregate per (profile, target level).
  */
object VerticalProfiles {

  /** Interval table `(level, lo, hi)` from consecutive edge values. */
  def levels(spark: SparkSession, edges: Seq[Double]): DataFrame = {
    require(edges.sliding(2).forall(p => p(0) < p(1)), s"edges not increasing: $edges")
    val rows = edges.sliding(2).zipWithIndex.map { case (Seq(lo, hi), i) => (i, lo, hi) }.toSeq
    spark.createDataFrame(rows).toDF("level", "lo", "hi")
  }

  /** Resample `(profile_id, level, r)` ratios from `srcEdges` intervals to
    * `dstEdges` intervals; each source ratio is split proportionally to
    * interval overlap (weight = overlap / source length). Conservative:
    * sums are preserved when dst covers src. */
  def resample(
      spark: SparkSession,
      profiles: DataFrame,
      srcEdges: Seq[Double],
      dstEdges: Seq[Double]): DataFrame = {
    val src = levels(spark, srcEdges).withColumnsRenamed(
      Map("level" -> "src_level", "lo" -> "slo", "hi" -> "shi"))
    val dst = levels(spark, dstEdges).withColumnsRenamed(
      Map("level" -> "dst_level", "lo" -> "dlo", "hi" -> "dhi"))
    val ov = least(col("shi"), col("dhi")) - greatest(col("slo"), col("dlo"))
    val w = src
      .crossJoin(dst)
      .withColumn("ov", ov)
      .where(col("ov") > 0)
      .select(col("src_level"), col("dst_level"),
        (col("ov") / (col("shi") - col("slo"))).as("weight"))
    profiles
      .join(broadcast(w), col("level") === col("src_level"))
      .groupBy(col("profile_id"), col("dst_level").as("out_level"))
      .agg(sum(col("r") * col("weight")).as("r"))
      .select(col("profile_id"), col("out_level").as("level"), col("r"))
  }

  /** Validity checks of the reference (`check_valid_vertical_profile`,
    * reference :221-251) as a DataFrame of violations (empty = valid). */
  def violations(profiles: DataFrame, tol: Double = 1e-9): DataFrame =
    profiles
      .groupBy("profile_id")
      .agg(sum("r").as("ratio_sum"),
        sum(when(col("r") < 0, 1).otherwise(0)).as("n_negative"))
      .where(abs(col("ratio_sum") - 1.0) > tol || col("n_negative") > 0)
}
