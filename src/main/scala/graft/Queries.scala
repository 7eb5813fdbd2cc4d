package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ops._

/** One registered correctness query per implemented operator (SURVEY.md §2).
  *
  * Each entry pairs a Spark implementation (through the operator library)
  * with an equivalent ANSI SQL statement DuckDB runs on the same parquet
  * tables. Numeric design rule: aggregates only ever sum values that are
  * exact in binary floating point (integer-valued doubles, dyadic weights),
  * or round identically on both sides — so the driver's hash compare cannot
  * drift on summation order between engines.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Queries {

  /** DuckDB CTE for the regrid weight table (mirrors Regrid.weights over
    * Tables.srcGrid → Tables.dstGrid, x-major ids). */
  private val WeightsCte: String =
    """src AS (SELECT i AS src_cell, (i // 64) * 1.0 AS sxmin, (i % 64) * 1.0 AS symin,
      |               (i // 64) + 1.0 AS sxmax, (i % 64) + 1.0 AS symax FROM range(4096) t(i)),
      |dst AS (SELECT j AS dst_cell, -0.5 + (j // 33) * 2.0 AS dxmin, -0.5 + (j % 33) * 2.0 AS dymin,
      |               -0.5 + (j // 33) * 2.0 + 2.0 AS dxmax, -0.5 + (j % 33) * 2.0 + 2.0 AS dymax FROM range(1089) t(j)),
      |w AS (SELECT s.src_cell, d.dst_cell,
      |             (least(s.sxmax, d.dxmax) - greatest(s.sxmin, d.dxmin)) *
      |             (least(s.symax, d.dymax) - greatest(s.symin, d.dymin)) AS weight
      |      FROM src s JOIN dst d
      |        ON s.sxmin < d.dxmax AND s.sxmax > d.dxmin
      |       AND s.symin < d.dymax AND s.symax > d.dymin)""".stripMargin

  private val catGroups = Map("grp_ret" -> Seq("A", "R"), "grp_cur" -> Seq("N"))
  private val subGroups = Map("ALL" -> Seq("F", "O"))

  val relational: Seq[Q] = Seq(
    Q("q_totals_rollup",
      (s, d) => Grouping.totals(emissions(s, d)),
      Some(s"""$EmiCte
        |SELECT substance, coalesce(category, '__total__') AS category, sum(value) AS total
        |FROM emissions GROUP BY GROUPING SETS ((substance, category), (substance))""".stripMargin)),

    Q("q_group_categories",
      (s, d) => Grouping.groupCategories(s, emissions(s, d), catGroups),
      Some(s"""$EmiCte
        |SELECT cell_id,
        |       CASE WHEN category IN ('A','R') THEN 'grp_ret' ELSE 'grp_cur' END AS category,
        |       substance, sum(value) AS value
        |FROM emissions GROUP BY 1, 2, 3""".stripMargin)),

    Q("q_group_substances",
      (s, d) => Grouping.groupSubstances(s, emissions(s, d), subGroups),
      Some(s"""$EmiCte
        |SELECT cell_id, category, 'ALL' AS substance, sum(value) AS value
        |FROM emissions GROUP BY 1, 2, 3""".stripMargin)),

    Q("q_add_inventories",
      (s, d) => {
        val a = emissions(s, d)
        val b = lineitem(s, d)
          .where(col("l_discount") > 0.05)
          .select(
            (col("l_orderkey") % 4096).as("cell_id"),
            col("l_returnflag").as("category"),
            col("l_linestatus").as("substance"),
            (col("l_quantity") * 0.5).as("value"))
        Grouping.addInventories(a, b)
      },
      Some(s"""$EmiCte,
        |b AS (SELECT l_orderkey % 4096 AS cell_id, l_returnflag AS category,
        |             l_linestatus AS substance, l_quantity * 0.5 AS value
        |      FROM lineitem WHERE l_discount > 0.05)
        |SELECT cell_id, category, substance, sum(value) AS value
        |FROM (SELECT * FROM emissions UNION ALL SELECT * FROM b)
        |GROUP BY 1, 2, 3""".stripMargin)),

    Q("q_scale",
      (s, d) => Grouping.scale(s, emissionsAgg(s, d),
        Seq(("A", "F", 0.5), ("N", "O", 1.25), ("R", "F", 2.0))),
      Some(s"""$EmiAggCte
        |SELECT cell_id, category, substance,
        |       value * (CASE WHEN category = 'A' AND substance = 'F' THEN 0.5
        |                     WHEN category = 'N' AND substance = 'O' THEN 1.25
        |                     WHEN category = 'R' AND substance = 'F' THEN 2.0
        |                     ELSE 1.0 END) AS value
        |FROM emi""".stripMargin)),

    Q("q_drop",
      (s, d) => Grouping.drop(emissions(s, d), categories = Seq("N"), substances = Seq("F")),
      Some(s"""$EmiCte
        |SELECT * FROM emissions WHERE category <> 'N' AND substance <> 'F'""".stripMargin)),

    Q("q_clip_box",
      (s, d) => Regrid.clipBox(emissionsAgg(s, d), srcGrid, 8.0, 8.0, 40.0, 56.0),
      Some(s"""$EmiAggCte
        |SELECT * FROM emi
        |WHERE (cell_id // 64) BETWEEN 8 AND 39 AND (cell_id % 64) BETWEEN 8 AND 55""".stripMargin)),

    Q("q_crop_box",
      (s, d) => Regrid.cropBox(emissionsAgg(s, d), srcGrid, 10.5, 10.5, 42.5, 42.5),
      Some(s"""$EmiAggCte,
        |boxed AS (SELECT cell_id, category, substance, value,
        |                 least((cell_id // 64) + 1.0, 42.5) - greatest((cell_id // 64) * 1.0, 10.5) AS ovx,
        |                 least((cell_id % 64) + 1.0, 42.5) - greatest((cell_id % 64) * 1.0, 10.5) AS ovy
        |          FROM emi)
        |SELECT cell_id, category, substance, value * (ovx * ovy) AS value
        |FROM boxed WHERE ovx > 0 AND ovy > 0""".stripMargin)),

    Q("q_regrid_weights",
      (s, _) => Regrid.weights(s, srcGrid, dstGrid),
      Some(s"WITH $WeightsCte SELECT src_cell, dst_cell, weight FROM w")),

    Q("q_remap",
      (s, d) => Regrid.remapInventory(s, emissionsAgg(s, d), srcGrid, dstGrid),
      Some(s"""$EmiAggCte,
        |$WeightsCte
        |SELECT w.dst_cell AS cell_id, category, substance, sum(value * weight) AS value
        |FROM emi JOIN w ON emi.cell_id = w.src_cell
        |GROUP BY 1, 2, 3""".stripMargin)),

    Q("q_remap_conservation",
      (s, d) => {
        val emi = emissionsAgg(s, d)
        Grouping.conservationDiff(emi, Regrid.remapInventory(s, emi, srcGrid, dstGrid))
      },
      Some(s"""$EmiAggCte,
        |$WeightsCte,
        |remapped AS (SELECT w.dst_cell AS cell_id, category, substance, sum(value * weight) AS value
        |             FROM emi JOIN w ON emi.cell_id = w.src_cell GROUP BY 1, 2, 3),
        |ta AS (SELECT category, substance, sum(value) AS total_a FROM emi GROUP BY 1, 2),
        |tb AS (SELECT category, substance, sum(value) AS total_b FROM remapped GROUP BY 1, 2)
        |SELECT coalesce(ta.category, tb.category) AS category,
        |       coalesce(ta.substance, tb.substance) AS substance,
        |       coalesce(total_a, 0.0) AS total_a, coalesce(total_b, 0.0) AS total_b,
        |       coalesce(total_a, 0.0) - coalesce(total_b, 0.0) AS abs_diff
        |FROM ta FULL OUTER JOIN tb ON ta.category = tb.category AND ta.substance = tb.substance""".stripMargin)),

    Q("q_speciate",
      (s, d) => Speciation.speciate(s, emissionsAgg(s, d), Seq(
        ("A", "F", "PM10", 0.25), ("A", "F", "PM25", 0.75),
        ("N", "O", "CO", 0.5), ("N", "O", "CO2", 0.5))),
      Some(s"""$EmiAggCte
        |SELECT cell_id, emi.category, rr.new_substance AS substance, value * rr.ratio AS value
        |FROM emi JOIN (VALUES ('A','F','PM10',0.25), ('A','F','PM25',0.75),
        |                      ('N','O','CO',0.5), ('N','O','CO2',0.5))
        |               rr(category, substance, new_substance, ratio)
        |  ON emi.category = rr.category AND emi.substance = rr.substance
        |UNION ALL
        |SELECT * FROM emi
        |WHERE NOT ((category = 'A' AND substance = 'F') OR (category = 'N' AND substance = 'O'))""".stripMargin)),

    Q("q_speciate_nox",
      (s, d) => Speciation.speciateNox(s, emissionsAgg(s, d), noxSubstance = "O", no2Fraction = 0.25),
      Some(s"""$EmiAggCte
        |SELECT cell_id, category, 'NO' AS substance, value * ((1.0 - 0.25) * 30.0 / 46.0) AS value
        |FROM emi WHERE substance = 'O'
        |UNION ALL
        |SELECT cell_id, category, 'NO2' AS substance, value * 0.25 AS value
        |FROM emi WHERE substance = 'O'
        |UNION ALL
        |SELECT cell_id, category, substance, value FROM emi WHERE substance <> 'O'""".stripMargin)),

    Q("q_merge_substances",
      (s, d) => Speciation.mergeSubstances(s, emissionsAgg(s, d), "TOT", Seq("F", "O")),
      Some(s"""$EmiAggCte
        |SELECT cell_id, category, 'TOT' AS substance, sum(value) AS value
        |FROM emi GROUP BY 1, 2, 3""".stripMargin)),

    Q("q_country_mask",
      (s, _) => CountryMask.bandMask(s, srcGrid,
        Seq(("C1", 0.0, 20.5), ("C2", 20.5, 43.5), ("C3", 43.5, 64.0))),
      Some("""WITH cells AS (SELECT i AS cell_id, (i % 64) * 1.0 AS ymin, (i % 64) + 1.0 AS ymax
        |              FROM range(4096) t(i)),
        |bands AS (SELECT * FROM (VALUES ('C1', 0.0, 20.5), ('C2', 20.5, 43.5), ('C3', 43.5, 64.0))
        |          b(country, bymin, bymax)),
        |ov AS (SELECT cell_id, country, least(ymax, bymax) - greatest(ymin, bymin) AS w
        |       FROM cells, bands WHERE least(ymax, bymax) - greatest(ymin, bymin) > 0)
        |SELECT cell_id, country FROM
        |  (SELECT cell_id, country, row_number() OVER (PARTITION BY cell_id ORDER BY w DESC, country ASC) AS rn
        |   FROM ov) WHERE rn = 1""".stripMargin)),

    Q("q_country_fractions",
      (s, _) => CountryMask.bandMask(s, srcGrid,
        Seq(("C1", 0.0, 20.5), ("C2", 20.5, 43.5), ("C3", 43.5, 64.0)), fractions = true),
      Some("""WITH cells AS (SELECT i AS cell_id, (i % 64) * 1.0 AS ymin, (i % 64) + 1.0 AS ymax
        |              FROM range(4096) t(i)),
        |bands AS (SELECT * FROM (VALUES ('C1', 0.0, 20.5), ('C2', 20.5, 43.5), ('C3', 43.5, 64.0))
        |          b(country, bymin, bymax))
        |SELECT cell_id, country, (least(ymax, bymax) - greatest(ymin, bymin)) / 1.0 AS fraction
        |FROM cells, bands WHERE least(ymax, bymax) - greatest(ymin, bymin) > 0""".stripMargin))
  )

  def all: Seq[Q] = relational
}
