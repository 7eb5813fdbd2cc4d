package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.RegularGrid

/** Conservative regridding between grids — the reference's centerpiece
  * operator family (reference: emiproc/regrid.py:104-310 weight generation,
  * :313-346 sparse remap product, :421-597 `remap_inventory`).
  *
  * Spark-first design: for regular×regular grids the spatial join degenerates
  * to closed-form box arithmetic on cell ids — weight generation is a NARROW
  * plan (range → sequence/explode → filter), no shuffle, no geometry library,
  * embarrassingly parallel over source cells. At 100 TB the weight table is
  * O(ncells × small fanout) and is the broadcast side of the remap join when
  * the destination grid is coarse.
  */
object Regrid {

  /** Sparse weight table `(src_cell, dst_cell, weight)` where
    * weight = area(src ∩ dst) / area(src) — the polygon rule of
    * emiproc/regrid.py:246-260, closed-form for axis-aligned boxes.
    *
    * Candidate destination indexes per source cell are generated
    * analytically (at most ceil(sdx/ddx)+1 per axis) via sequence+explode,
    * so the plan is scan-free and shuffle-free.
    */
  def weights(spark: SparkSession, src: RegularGrid, dst: RegularGrid): DataFrame = {
    val cells = src.cells(spark) // (cell_id, xmin, ymin, xmax, ymax)

    def candRange(lo: Column, hi: Column, gmin: Double, gd: Double, gn: Int): (Column, Column) = {
      val j0 = greatest(lit(0), floor((lo - gmin) / gd).cast("int"))
      val j1 = least(lit(gn - 1), floor((hi - gmin) / gd).cast("int"))
      (j0, j1)
    }

    val (jx0, jx1) = candRange(col("xmin"), col("xmax"), dst.xmin, dst.dx, dst.nx)
    val (jy0, jy1) = candRange(col("ymin"), col("ymax"), dst.ymin, dst.dy, dst.ny)

    val withCand = cells
      .where(jx1 >= jx0 && jy1 >= jy0)
      .select(
        col("cell_id").as("src_cell"),
        col("xmin"), col("ymin"), col("xmax"), col("ymax"),
        explode(sequence(jx0, jx1)).as("jx"),
        jy0.as("jy0"), jy1.as("jy1"))
      .select(
        col("src_cell"), col("xmin"), col("ymin"), col("xmax"), col("ymax"),
        col("jx"), explode(sequence(col("jy0"), col("jy1"))).as("jy"))

    val dxmin = lit(dst.xmin) + col("jx") * dst.dx
    val dymin = lit(dst.ymin) + col("jy") * dst.dy
    val ovx = least(col("xmax"), dxmin + dst.dx) - greatest(col("xmin"), dxmin)
    val ovy = least(col("ymax"), dymin + dst.dy) - greatest(col("ymin"), dymin)

    withCand
      .select(
        col("src_cell"),
        (col("jx").cast("long") * dst.ny + col("jy")).as("dst_cell"),
        (ovx * ovy / (src.dx * src.dy)).as("weight"),
        ovx.as("_ovx"), ovy.as("_ovy"))
      .where(col("_ovx") > 0 && col("_ovy") > 0)
      .drop("_ovx", "_ovy")
  }

  /** Materialized weight view — the reference's weight cache
    * (emiproc/regrid.py:42-101 `get_weights_mapping`: load `.npz` if
    * present else compute+save). Parquet keyed by the grid-pair
    * signature; irregular-grid weights (expensive geometry) amortize
    * across runs, regular×regular pairs are cheap enough that the cache
    * is read-through convenience. */
  def cachedWeights(
      spark: SparkSession,
      src: RegularGrid,
      dst: RegularGrid,
      cacheDir: String): DataFrame = {
    def sig(g: RegularGrid) =
      s"${g.nx}x${g.ny}_${g.xmin}_${g.ymin}_${g.dx}_${g.dy}".replace("-", "m")
    val path = s"$cacheDir/weights_${sig(src)}__${sig(dst)}"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path))) {
      weights(spark, src, dst).write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }

  /** The sparse matrix–vector product of emiproc/regrid.py:313-334
    * (`weights_remap`), for ALL (category, substance) pairs in ONE
    * shuffle: weights ⋈ emissions on src cell, then hash-aggregate on
    * (dst_cell, category, substance). The weight side is broadcast when
    * small (coarse destination); otherwise AQE picks the join. */
  def remap(emissions: DataFrame, weights: DataFrame): DataFrame =
    emissions
      .join(weights.withColumnRenamed("src_cell", "cell_id"), Seq("cell_id"))
      .groupBy(col("dst_cell").as("cell_id"), col("category"), col("substance"))
      .agg(sum(col("value") * col("weight")).as("value"))
      .select(col("cell_id"), col("category"), col("substance"), col("value"))

  /** Join-free regular×regular remap: the weight arithmetic of [[weights]]
    * applied directly to the fact table's `cell_id` (candidate dst cells
    * exploded per row, ≤ (ceil(sdx/ddx)+1)² of them). Numerically
    * IDENTICAL to the weight-table join (same expressions on the same
    * inputs), but the whole plan has exactly ONE shuffle — the final
    * aggregate — instead of a 2×-fact-table join shuffle + aggregate
    * shuffle. At EDGAR scale (207M rows) this halves wall time; at 100 TB
    * it removes the dominant exchange. */
  def remapDirect(
      emissions: DataFrame,
      src: RegularGrid,
      dst: RegularGrid): DataFrame =
    remapExplode(emissions, src, dst)
      .groupBy(col("cell_id"), col("category"), col("substance"))
      .agg(sum(col("contrib")).as("value"))
      .select(col("cell_id"), col("category"), col("substance"), col("value"))

  /** The narrow half of [[remapDirect]]: per-row candidate destination
    * cells with their weighted contributions, BEFORE the aggregate —
    * composable (e.g. [[combineInventories]] unions two of these and
    * aggregates once, halving the shuffled volume vs aggregating each
    * branch and re-aggregating the union). */
  private def remapExplode(
      emissions: DataFrame,
      src: RegularGrid,
      dst: RegularGrid): DataFrame = {
    val cid = col("cell_id")
    val xmin = src.cellXmin(cid)
    val ymin = src.cellYmin(cid)
    val xmax = src.cellXmax(cid)
    val ymax = src.cellYmax(cid)

    def candRange(lo: Column, hi: Column, gmin: Double, gd: Double, gn: Int): (Column, Column) = {
      val j0 = greatest(lit(0), floor((lo - gmin) / gd).cast("int"))
      val j1 = least(lit(gn - 1), floor((hi - gmin) / gd).cast("int"))
      (j0, j1)
    }

    val (jx0, jx1) = candRange(xmin, xmax, dst.xmin, dst.dx, dst.nx)
    val (jy0, jy1) = candRange(ymin, ymax, dst.ymin, dst.dy, dst.ny)

    val withCand = emissions
      .withColumn("_xmin", xmin).withColumn("_ymin", ymin)
      .withColumn("_xmax", xmax).withColumn("_ymax", ymax)
      .where(jx1 >= jx0 && jy1 >= jy0)
      .select(col("*"), explode(sequence(jx0, jx1)).as("_jx"))
      .select(col("*"), explode(sequence(jy0, jy1)).as("_jy"))

    val dxmin = lit(dst.xmin) + col("_jx") * dst.dx
    val dymin = lit(dst.ymin) + col("_jy") * dst.dy
    val ovx = least(col("_xmax"), dxmin + dst.dx) - greatest(col("_xmin"), dxmin)
    val ovy = least(col("_ymax"), dymin + dst.dy) - greatest(col("_ymin"), dymin)
    val weight = ovx * ovy / (src.dx * src.dy)

    withCand
      .withColumn("_w", weight)
      .where(ovx > 0 && ovy > 0)
      .select(
        (col("_jx").cast("long") * dst.ny + col("_jy")).as("cell_id"),
        col("category"), col("substance"),
        (col("value") * col("_w")).as("contrib"))
  }

  /** End-to-end remap (emiproc/regrid.py:421-597 `remap_inventory`) for
    * regular grids — the join-free [[remapDirect]] plan. */
  def remapInventory(
      spark: SparkSession,
      emissions: DataFrame,
      src: RegularGrid,
      dst: RegularGrid): DataFrame =
    remapDirect(emissions, src, dst)

  /** Crop by a box with fractional boundary weights — the reference's
    * `crop_with_shape` on a rectangle (emiproc/inventories/utils.py:120-261
    * via `geoserie_intersection`, emiproc/regrid.py:349-418): each cell's
    * value is scaled by the fraction of its area inside the box; zero-weight
    * cells are dropped (`drop_unused`). Pure arithmetic on a regular grid. */
  def cropBox(
      emissions: DataFrame,
      grid: RegularGrid,
      bxmin: Double, bymin: Double, bxmax: Double, bymax: Double): DataFrame = {
    val cid = col("cell_id")
    val ovx = least(grid.cellXmax(cid), lit(bxmax)) - greatest(grid.cellXmin(cid), lit(bxmin))
    val ovy = least(grid.cellYmax(cid), lit(bymax)) - greatest(grid.cellYmin(cid), lit(bymin))
    val w = when(ovx > 0 && ovy > 0, ovx * ovy / (grid.dx * grid.dy)).otherwise(lit(0.0))
    emissions
      .withColumn("crop_weight", w)
      .where(col("crop_weight") > 0)
      .withColumn("value", col("value") * col("crop_weight"))
      .drop("crop_weight")
  }

  /** R14 `combine_inventories` — boundary-stitched combination of two
    * inventories (reference: emiproc/inventories/utils.py:687-711; declared
    * there but raises NotImplementedError — semantics reconstructed from
    * the docstring and the step comments in the body): the `inside`
    * inventory is authoritative within `boundary`, `outside` beyond it,
    * and cells straddling the boundary contribute by exact area fraction
    * (the same fractional rule as crop_with_shape, so no emission mass is
    * double-counted or lost at the seam). Both cropped parts are remapped
    * onto `output` and summed; (category, substance) pairs present on only
    * one side are implicitly 0 on the other (long format: the union just
    * carries them through).
    *
    * Plan shape at scale: two zero-shuffle crop maps (inline clip for
    * small boundaries — see cropWithPolygon), two narrow candidate
    * explodes, then exactly ONE exchange: the unioned pre-aggregate
    * contributions hash-aggregate on (cell, category, substance) with
    * map-side partial aggregation — the whole stitch costs a single
    * shuffle of the exploded rows. */
  def combineInventories(
      spark: SparkSession,
      inside: DataFrame, insideGrid: RegularGrid,
      outside: DataFrame, outsideGrid: RegularGrid,
      boundary: Seq[(Double, Double)],
      output: RegularGrid): DataFrame = {
    val inPart = PolygonCrop.cropWithPolygon(spark, inside, insideGrid, boundary)
    val outPart = PolygonCrop.cropWithPolygon(
      spark, outside, outsideGrid, boundary, keepOutside = true)
    // union the pre-aggregate exploded contributions and aggregate ONCE:
    // the seam costs a single exchange over the exploded rows instead of
    // per-branch aggregates plus a re-aggregate of the union
    remapExplode(inPart, insideGrid, output)
      .unionByName(remapExplode(outPart, outsideGrid, output))
      .groupBy("cell_id", "category", "substance")
      .agg(sum("contrib").as("value"))
  }

  /** Hard clip: keep cells INTERSECTING the index box — the reference's
    * `clip_box` (emiproc/inventories/utils.py:888-954, geopandas `.cx`
    * bbox selection): a plain predicate, partition-prunable on a regular
    * grid. Divergence note: `.cx` also keeps geometries merely TOUCHING
    * the box edge; our strict inequalities exclude zero-area contact
    * (see RegularGrid.intersectsBox). */
  def clipBox(
      emissions: DataFrame,
      grid: RegularGrid,
      bxmin: Double, bymin: Double, bxmax: Double, bymax: Double): DataFrame =
    emissions.where(grid.intersectsBox(col("cell_id"), bxmin, bymin, bxmax, bymax))
}
