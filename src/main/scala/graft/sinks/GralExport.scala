package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{PointInPolyArrayExpr, PolyAreaExpr}

/** GRAL emission file set — reference `EmissionWriter`
  * (emiproc/exports/gral.py:65-331) and its text formats:
  *
  *  - `point.dat` (2 header lines): x,y,z,emission[kg/h],0,0,0,
  *    exit_velocity,diameter,temperature,source_group (`:197-224`);
  *  - `line.dat` (5 header lines): LineStrings split into straight
  *    sections, emission divided by segment LENGTH ratio (`:236-262`);
  *  - `cadastre.dat` (1 header line): polygons rasterized on a
  *    `polygon_raster_size` grid anchored at the polygon set's bbox,
  *    CELL-CENTER containment (rasterize all_touched=False), cell
  *    emission = emission × cellArea / polyArea, additive merge
  *    (`:288-331` — the reference warns this is not exactly mass
  *    conserving; neither is this, by construction);
  *  - source-group ids = substance_index × ncategories + category_index
  *    (`:82-88`).
  *
  * All shapes are narrow maps (explode + expression kernels) — no
  * shuffle until an optional final sort. Readers for the same formats
  * (the S8 ingestion path) skip the documented header-line counts.
  */
object GralExport {

  /** source_group dimension table (substance, category, source_group). */
  def sourceGroups(
      spark: SparkSession,
      substances: Seq[String],
      categories: Seq[String]): DataFrame = {
    val rows = for {
      (sub, i) <- substances.zipWithIndex
      (cat, j) <- categories.zipWithIndex
    } yield (sub, cat, i * categories.length + j)
    spark.createDataFrame(rows).toDF("substance", "category", "source_group")
  }

  /** point.dat rows from `(x, y, z, value, source_group)` points plus
    * constant EmissionInfo fields. */
  def pointRows(
      points: DataFrame,
      speed: Double, diameter: Double, temperature: Double): DataFrame =
    points.select(
      concat_ws(",",
        col("x"), col("y"), col("z"), col("value"),
        lit(0), lit(0), lit(0),
        lit(speed), lit(diameter), lit(temperature),
        col("source_group")).as("line"))

  /** Per-category emission metadata — the reference's `EmissionInfo`
    * record (emiproc/inventories/__init__.py:44-72) with the fields the
    * GRAL writers consume. */
  final case class EmissionInfo(
      height: Double = 0.0,
      heightOverBuildings: Boolean = true,
      width: Double = 0.5,
      verticalExtension: Double = 3.0,
      temperature: Double = 353.0,
      speed: Double = 5.0)

  /** Broadcastable (category → EmissionInfo) dim table. */
  def infoTable(
      spark: SparkSession, infos: Seq[(String, EmissionInfo)]): DataFrame =
    spark.createDataFrame(infos.map { case (c, i) =>
      (c, i.height, i.heightOverBuildings, i.width, i.verticalExtension,
        i.temperature, i.speed)
    }).toDF("category", "ei_height", "ei_hob", "ei_width", "ei_vext",
      "ei_temp", "ei_speed")

  private def cellAt(grid: graft.model.RegularGrid,
      x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
    floor((x - grid.xmin) / grid.dx).cast("long") * grid.ny +
      floor((y - grid.ymin) / grid.dy).cast("long")

  /** point.dat rows with PER-CATEGORY EmissionInfo and the reference's
    * building-height rule (gral.py:197-224): z = info.height, plus the
    * building height at the source's grid cell when
    * `height_over_buildings`. `buildingHeights(cell_id, bh)` is the
    * GRAL grid's building raster; the join is keyed by cell id (AQE
    * picks broadcast vs shuffle by its size). */
  def pointRowsInfo(
      spark: SparkSession,
      points: DataFrame, // (x, y, value, category, source_group)
      infos: Seq[(String, EmissionInfo)],
      grid: graft.model.RegularGrid,
      buildingHeights: DataFrame): DataFrame = {
    val bh = buildingHeights.select(col("cell_id").as("_bc"), col("bh").as("_bh"))
    points
      .join(broadcast(infoTable(spark, infos)), "category")
      .withColumn("_cell", cellAt(grid, col("x"), col("y")))
      .join(bh, col("_cell") === col("_bc"), "left")
      .withColumn("z", col("ei_height") +
        when(col("ei_hob"), coalesce(col("_bh"), lit(0.0))).otherwise(0.0))
      .select(
        concat_ws(",",
          col("x"), col("y"), col("z"), col("value"),
          lit(0), lit(0), lit(0),
          col("ei_speed"), col("ei_width"), col("ei_temp"),
          col("source_group")).as("line"))
  }

  /** line.dat rows with PER-CATEGORY EmissionInfo: each segment's start
    * and end z carry the building height at their own endpoint cell
    * (gral.py:264-286). */
  def lineRowsInfo(
      spark: SparkSession,
      lines: DataFrame, // (line_id, xs, ys, value, category, source_group)
      infos: Seq[(String, EmissionInfo)],
      grid: graft.model.RegularGrid,
      buildingHeights: DataFrame): DataFrame = {
    val n = size(col("xs"))
    val seg = lines
      .join(broadcast(infoTable(spark, infos)), "category")
      .withColumn("_i", explode(sequence(lit(0), n - 2)))
      .withColumn("_x1", element_at(col("xs"), col("_i") + 1))
      .withColumn("_y1", element_at(col("ys"), col("_i") + 1))
      .withColumn("_x2", element_at(col("xs"), col("_i") + 2))
      .withColumn("_y2", element_at(col("ys"), col("_i") + 2))
      .withColumn("_len", sqrt(
        (col("_x2") - col("_x1")) * (col("_x2") - col("_x1")) +
          (col("_y2") - col("_y1")) * (col("_y2") - col("_y1"))))
    val tot = org.apache.spark.sql.expressions.Window.partitionBy("line_id")
    val bh1 = buildingHeights.select(col("cell_id").as("_bc1"), col("bh").as("_bh1"))
    val bh2 = buildingHeights.select(col("cell_id").as("_bc2"), col("bh").as("_bh2"))
    seg
      .withColumn("_em", col("value") * col("_len") / sum("_len").over(tot))
      .withColumn("_c1", cellAt(grid, col("_x1"), col("_y1")))
      .withColumn("_c2", cellAt(grid, col("_x2"), col("_y2")))
      .join(bh1, col("_c1") === col("_bc1"), "left")
      .join(bh2, col("_c2") === col("_bc2"), "left")
      .withColumn("_z1", col("ei_height") +
        when(col("ei_hob"), coalesce(col("_bh1"), lit(0.0))).otherwise(0.0))
      .withColumn("_z2", col("ei_height") +
        when(col("ei_hob"), coalesce(col("_bh2"), lit(0.0))).otherwise(0.0))
      .select(
        concat_ws(",",
          lit("unnamed"), col("_i"), col("source_group"),
          col("_x1"), col("_y1"), col("_z1"),
          col("_x2"), col("_y2"), col("_z2"),
          col("ei_width"), concat(lit("-"), col("ei_vext")), lit(0), lit(0),
          col("_em"), lit(0), lit(0), lit(0), lit(0)).as("line"))
  }

  /** line.dat rows: `lines(line_id, xs, ys, value, source_group)` with
    * vertex arrays; each consecutive vertex pair becomes a section whose
    * emission is value × segLen / totalLen. */
  def lineRows(
      lines: DataFrame,
      height: Double, width: Double, verticalExtension: Double): DataFrame = {
    val n = size(col("xs"))
    val seg = lines
      .withColumn("_i", explode(sequence(lit(0), n - 2)))
      .withColumn("_x1", element_at(col("xs"), col("_i") + 1))
      .withColumn("_y1", element_at(col("ys"), col("_i") + 1))
      .withColumn("_x2", element_at(col("xs"), col("_i") + 2))
      .withColumn("_y2", element_at(col("ys"), col("_i") + 2))
      .withColumn("_len", sqrt(
        (col("_x2") - col("_x1")) * (col("_x2") - col("_x1")) +
          (col("_y2") - col("_y1")) * (col("_y2") - col("_y1"))))
    val tot = org.apache.spark.sql.expressions.Window.partitionBy("line_id")
    seg
      .withColumn("_em", col("value") * col("_len") / sum("_len").over(tot))
      .select(
        concat_ws(",",
          lit("unnamed"), col("_i"), col("source_group"),
          col("_x1"), col("_y1"), lit(height),
          col("_x2"), col("_y2"), lit(height),
          lit(width), lit(s"-$verticalExtension"), lit(0), lit(0),
          col("_em"), lit(0), lit(0), lit(0), lit(0)).as("line"))
  }

  /** cadastre.dat rows: polygons `(poly_id, xs, ys, value,
    * source_group)` rasterized at `rasterSize` on a grid anchored at
    * (anchorX, anchorY) — the polygon set's bbox min in the reference;
    * passed explicitly here so the anchor is deterministic without a
    * driver-side total_bounds pass (compute it with an agg when
    * mirroring the reference exactly). */
  def cadastreCells(
      polys: DataFrame,
      rasterSize: Double,
      anchorX: Double,
      anchorY: Double): DataFrame = {
    val bx0 = array_min(col("xs"))
    val bx1 = array_max(col("xs"))
    val by0 = array_min(col("ys"))
    val by1 = array_max(col("ys"))
    val jx0 = floor((bx0 - anchorX) / rasterSize).cast("int")
    val jx1 = floor((bx1 - anchorX) / rasterSize).cast("int")
    val jy0 = floor((by0 - anchorY) / rasterSize).cast("int")
    val jy1 = floor((by1 - anchorY) / rasterSize).cast("int")
    val cand = polys
      .withColumn("_area", PolyAreaExpr.col(col("xs"), col("ys")))
      .select(col("*"), explode(sequence(jx0, jx1)).as("_jx"))
      .select(col("*"), explode(sequence(jy0, jy1)).as("_jy"))
    val cx = lit(anchorX) + col("_jx") * rasterSize
    val cy = lit(anchorY) + col("_jy") * rasterSize
    // cell-center containment (rasterize all_touched=False); boundary
    // (code 1) counts as inside like rasterio's center rule
    val inside = PointInPolyArrayExpr.col(
      cx + rasterSize / 2, cy + rasterSize / 2, col("xs"), col("ys")) >= 1
    cand
      .where(inside)
      .groupBy(cx.as("x"), cy.as("y"), col("source_group"))
      .agg(sum(col("value") * (rasterSize * rasterSize) / col("_area")).as("emission"))
      .select(col("x"), col("y"), col("source_group"), col("emission"))
  }

  /** cadastre.dat text rows from [[cadastreCells]] output. */
  def cadastreRows(
      cells: DataFrame,
      rasterSize: Double, height: Double, verticalExtension: Double): DataFrame =
    cells.select(
      concat_ws(",",
        col("x"), col("y"), lit(height),
        lit(rasterSize), lit(rasterSize), lit(verticalExtension),
        col("emission"), lit(0), lit(0), lit(0), col("source_group"),
        lit("")).as("line"))

  // ---- S8: readers for the same text formats ----

  /** DataFrame-native .dat reader: the reference skips N header lines
    * positionally (pandas `skiprows`, gral.py:104-120); line position is
    * not a distributed-friendly predicate, so headers are dropped by
    * SHAPE instead — a row must split into exactly `cols.length` fields
    * and its `probe` field must `try_cast` to a number. GRAL headers
    * (free text + column-name lines) fail both; the whole read stays in
    * the text source + codegen'd filters, no RDD hop. */
  private def readSkipping(
      spark: SparkSession, path: String, skip: Int, cols: Seq[String],
      probe: Int = 0): DataFrame = {
    val f = split(col("value"), ",", -1)
    spark.read.text(path)
      .select(f.as("f"))
      .where(size(col("f")) === cols.length &&
        expr(s"try_cast(element_at(f, ${probe + 1}) AS DOUBLE)").isNotNull)
      .select(cols.zipWithIndex.map { case (c, i) =>
        col("f").getItem(i).as(c) }: _*)
  }

  // portals.dat is intentionally ABSENT: the reference detects the file
  // but raises "reading portals is not implemented" (gral.py:318-325) —
  // mirrored here like R14 combine_inventories.

  /** point.dat reader (2 header lines ignored — gral.py:104). */
  def readPoints(spark: SparkSession, path: String): DataFrame =
    readSkipping(spark, path, 2, Seq(
      "x", "y", "z", "emission", "u0", "u1", "u2",
      "exit_velocity", "diameter", "temperature", "source_group"))
      .select(
        col("x").cast("double"), col("y").cast("double"),
        col("z").cast("double"), col("emission").cast("double"),
        col("source_group").cast("int"))

  /** line.dat reader (5 header lines ignored — gral.py:108-117). */
  def readLines(spark: SparkSession, path: String): DataFrame =
    readSkipping(spark, path, 5, Seq(
      "name", "section", "source_group", "x1", "y1", "z1", "x2", "y2", "z2",
      "width", "vert_ext", "d0", "d1", "emission", "d2", "d3", "d4", "d5"),
      probe = 1) // first field is a free-text name; probe `section`
      .select(
        col("name"), col("section").cast("int"),
        col("source_group").cast("int"),
        col("x1").cast("double"), col("y1").cast("double"),
        col("x2").cast("double"), col("y2").cast("double"),
        col("emission").cast("double"))

  /** cadastre.dat reader (1 header line ignored — gral.py:120). */
  def readCadastre(spark: SparkSession, path: String): DataFrame =
    readSkipping(spark, path, 1, Seq(
      "x", "y", "z", "dx", "dy", "dz", "emission",
      "d0", "d1", "d2", "source_group", "trail"))
      .select(
        col("x").cast("double"), col("y").cast("double"),
        col("dx").cast("double"), col("dy").cast("double"),
        col("emission").cast("double"), col("source_group").cast("int"))
}
