package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.{Inventory, RegularGrid}
import graft.profiles.Profiles

/** Inventory-level facade — the user-facing surface a reference user
  * would call (`remap_inventory`, `group_categories`, …), orchestrating
  * the table-level operators over the [[Inventory]] bundle and carrying
  * the `history` lineage like the reference
  * (emiproc/inventories/__init__.py:118). */
object InventoryOps {

  /** R4 end-to-end remap (emiproc/regrid.py:421-597): gridded emissions
    * through the weight join, point sources folded in with the 1/n point
    * rule, cell-dim profiles re-gridded; history appended. */
  def remap(spark: SparkSession, inv: Inventory, dst: RegularGrid): Inventory = {
    val src = inv.grid.getOrElse(
      throw new IllegalArgumentException("remap needs a source grid"))
    val weights = Regrid.weights(spark, src, dst)
    val gridded = Regrid.remap(inv.emissions, weights)
    val withSources = inv.sources match {
      case Some(srcs) =>
        val pts = srcs.where(col("geom_kind") === "point")
          .select(col("source_id"), col("category"), col("substance"),
            col("value"), col("x"), col("y"))
        if (pts.isEmpty) gridded
        else SourceWeights.addPointSources(gridded, pts, dst)
      case None => gridded
    }
    val remappedProfiles = inv.tProfiles.map { p =>
      val cellW = inv.emissions.groupBy("cell_id").agg(sum("value").as("w"))
      Profiles.remapProfiles(p, cellW, weights)
    }
    inv.copy(
      emissions = withSources,
      grid = Some(dst),
      tProfiles = remappedProfiles)
      .appendHistory(s"remapped ${src.nx}x${src.ny} -> ${dst.nx}x${dst.ny}")
  }

  def groupCategories(
      spark: SparkSession,
      inv: Inventory,
      mapping: Map[String, Seq[String]]): Inventory =
    inv.copy(emissions = Grouping.groupCategories(spark, inv.emissions, mapping))
      .appendHistory(s"grouped categories into ${mapping.keys.mkString(",")}")

  def cropBox(
      inv: Inventory,
      bxmin: Double, bymin: Double, bxmax: Double, bymax: Double): Inventory = {
    val g = inv.grid.getOrElse(
      throw new IllegalArgumentException("cropBox needs a grid"))
    inv.copy(emissions = Regrid.cropBox(inv.emissions, g, bxmin, bymin, bxmax, bymax))
      .appendHistory(s"cropped to ($bxmin,$bymin,$bxmax,$bymax)")
  }

  def speciate(
      spark: SparkSession,
      inv: Inventory,
      ratios: Seq[(String, String, String, Double)]): Inventory =
    inv.copy(emissions = Speciation.speciate(spark, inv.emissions, ratios))
      .appendHistory(s"speciated ${ratios.map(r => s"${r._1}/${r._2}").distinct.mkString(",")}")

  def totals(inv: Inventory) = Grouping.totals(inv.emissions)
}
