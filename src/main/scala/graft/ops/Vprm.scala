package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** VPRM vegetation CO₂ flux model, standard variant — the reference's
  * `calculate_vprm_emissions` (emiproc/profiles/vprm.py:105-367):
  *
  *   PAR    = RAD / 0.505
  *   resp   = α·T + β, clamped to α·Tlow + β for T ≤ Tlow
  *   Tprod  = (T−Tmin)(T−Tmax);  Tscale = Tprod / (Tprod − (T−Topt)²),
  *            0 for T ≤ Tmin
  *   Wscale = (1+LSWI) / (1+max LSWI)                (per vegetation)
  *   evithr = min EVI + 0.55·(max EVI − min EVI)
  *   Pscale = (1+LSWI)/2, 1 when EVI ≥ evithr, 1 for evergreen types
  *   GEE    = −λ·Tscale·Pscale·Wscale·EVI·PAR / (1 + PAR/PAR0)
  *   NEE    = resp + GEE                              (µmol m⁻² s⁻¹)
  *
  * Long-format Spark shape: `obs(veg_type, ts, t, rad, lswi, evi)` ⋈
  * broadcast `params(veg_type, alpha, beta, lambda, tmin, topt, tmax,
  * tlow, par0)`; the per-vegetation min/max are windows over veg_type —
  * everything else is a narrow `select`. */
object Vprm {

  def calculateEmissions(obs: DataFrame, params: DataFrame): DataFrame = {
    val w = Window.partitionBy("veg_type")
    val joined = obs
      .join(broadcast(params), "veg_type")
      .withColumn("par", col("rad") / 0.505)
      .withColumn("lswi_max", max("lswi").over(w))
      .withColumn("evi_min", min("evi").over(w))
      .withColumn("evi_max", max("evi").over(w))
    val resp = when(col("t") <= col("tlow"), col("alpha") * col("tlow") + col("beta"))
      .otherwise(col("alpha") * col("t") + col("beta"))
    val tprod = (col("t") - col("tmin")) * (col("t") - col("tmax"))
    val tscale = when(col("t") <= col("tmin"), lit(0.0))
      .otherwise(tprod / (tprod - (col("t") - col("topt")) * (col("t") - col("topt"))))
    val wscale = (lit(1.0) + col("lswi")) / (lit(1.0) + col("lswi_max"))
    val evithr = col("evi_min") + lit(0.55) * (col("evi_max") - col("evi_min"))
    val pscale = when(lower(col("veg_type")).contains("evergreen"), lit(1.0))
      .when(col("evi") >= evithr, lit(1.0))
      .otherwise((lit(1.0) + col("lswi")) / 2.0)
    val gee = -(col("lambda") * tscale * pscale * wscale * col("evi") * col("par") /
      (lit(1.0) + col("par") / col("par0")))
    joined.select(
      col("veg_type"), col("ts"),
      tscale.as("tscale"), wscale.as("wscale"), pscale.as("pscale"),
      resp.as("resp"), gee.as("gee"), (resp + gee).as("nee"))
  }
}
