package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.SpatialJoin

/** S6 — MapLuftZurich inventory loader (reference `MapLuftZurich`,
  * emiproc/inventories/zurich/__init__.py:18-117): one `.gdb` layer per
  * emission category, each feature carrying absolute `Emission_<sub>`
  * attributes in kg/a. Reproduces the reference's selection rules:
  * substances map through `Emission_<sub>` with the `Emission_Benzol` →
  * `benzene` exception (:78-81), categories with none of the requested
  * substances are skipped (:98-101), the Josefstrasse KHKW point source
  * can be removed (:103-113, the hardcoded point 2681839/1248988 in
  * category `c2301_KHKWKehricht_Emissionen_Kanton`), and line layers
  * convert to polygons by square-cap buffering with half-width 10 m
  * (utils.py:58-88 `buffer(line_width, cap_style=3)`; here the engine's
  * per-segment [[SpatialJoin.bufferLines]] — joint overlaps between
  * consecutive segments are the documented delta vs shapely's unioned
  * buffer).
  *
  * The `.gdb` container parses through [[FileGdb]] (V10 subset; see its
  * scope note). Output: category → DataFrame of features with substance
  * columns (renamed) and geometry `(fid, geom_type, part, xs, ys)`;
  * buffered line layers carry `(poly_id, seg, xs, ys)` rectangles.
  */
object MapLuft {

  val DefaultSubstances: Seq[String] = Seq(
    "CO2", "CO", "PM10ex", "PM10non", "PM25ex", "PM25non", "SO2", "NOx",
    "N2O", "NH3", "CH4", "BC", "VOC", "benzene")

  val JosefstrasseCategory = "c2301_KHKWKehricht_Emissionen_Kanton"
  val JosefstrassePoint: (Double, Double) = (2681839.0, 1248988.0)

  private def emissionColumn(sub: String): String =
    if (sub == "benzene") "Emission_Benzol" else s"Emission_$sub"

  def read(
      spark: SparkSession,
      gdbDir: String,
      substances: Seq[String] = DefaultSubstances,
      categories: Seq[String] = Nil,
      removeJosefstrasseKhkw: Boolean = false,
      convertLinesToPolygons: Boolean = true,
      lineWidth: Double = 10.0): Map[String, DataFrame] = {
    val layerNames =
      if (categories.nonEmpty) categories
      else FileGdb.listLayers(gdbDir).map(_._2)
    val emissionNames = substances.map(s => emissionColumn(s) -> s).toMap

    layerNames.flatMap { category =>
      val gdf = FileGdb.readLayer(spark, gdbDir, category)
      val present = gdf.columns.filter(emissionNames.contains)
      if (present.isEmpty) None // category has no requested substance
      else {
        val renamed = present.foldLeft(gdf) { (df, c) =>
          df.withColumnRenamed(c, emissionNames(c))
        }
        val oid = renamed.columns.find(_.equalsIgnoreCase("OBJECTID"))
          .getOrElse(renamed.columns.head)
        val kept = renamed.select(
          (Seq(col(oid).as("fid"), col("geom_type"), col("part"),
            col("xs"), col("ys")) ++
            present.map(c => col(emissionNames(c)))): _*)
        val dejosefed =
          if (removeJosefstrasseKhkw && category == JosefstrasseCategory)
            kept.where(!(col("geom_type") === 1 &&
              element_at(col("xs"), 1) === JosefstrassePoint._1 &&
              element_at(col("ys"), 1) === JosefstrassePoint._2))
          else kept
        val isLineLayer = convertLinesToPolygons &&
          !dejosefed.head(1).isEmpty &&
          dejosefed.head(1)(0).getAs[Any]("geom_type") == 3
        val out =
          if (!isLineLayer) dejosefed
          else {
            // unique line key per (feature, part), buffered per segment
            val lines = dejosefed.withColumn("line_id",
              col("fid") * 1000 + col("part"))
            SpatialJoin.bufferLines(
              lines.select(col("line_id"), col("xs"), col("ys")),
              width = lineWidth)
              .join(lines.drop("xs", "ys"),
                col("poly_id") === col("line_id"))
              .drop("line_id", "geom_type", "part")
          }
        Some(category -> out)
      }
    }.toMap
  }
}
