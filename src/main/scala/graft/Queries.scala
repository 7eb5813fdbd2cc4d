package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ops._
import graft.profiles.{Profiles, Temporal, VerticalProfiles}

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

    // The fused regroup+rollup (groupedTotals): same result as
    // totals(groupCategories(...)) but without the (cell, group,
    // substance) data-scale aggregate — see ScaleBench B2 vs B2b.
    Q("q_grouped_totals",
      (s, d) => Grouping.groupedTotals(s, emissions(s, d), catGroups),
      Some(s"""$EmiCte,
        |g AS (SELECT CASE WHEN category IN ('A','R') THEN 'grp_ret' ELSE 'grp_cur' END AS category,
        |             substance, value
        |      FROM emissions)
        |SELECT substance, coalesce(category, '__total__') AS category, sum(value) AS total
        |FROM g GROUP BY GROUPING SETS ((substance, category), (substance))""".stripMargin)),

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

    // R2 weight cache (emiproc/regrid.py:42-101 get_weights_mapping):
    // first call computes + writes the parquet cache, second call READS
    // it back — the gate row checks the cached table against the same
    // closed-form weight SQL as q_regrid_weights (dyadic weights survive
    // the parquet round-trip bit-exactly).
    Q("q_weight_cache",
      (s, _) => {
        val dir = TempDirs.create("wcache")
        Regrid.cachedWeights(s, srcGrid, dstGrid, dir).count() // write path
        Regrid.cachedWeights(s, srcGrid, dstGrid, dir) // read-back path
      },
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

    Q("q_speciate_table",
      (s, d) => {
        val table = graft.sources.SpeciationCsv.read(
          s, "/root/repo/fixtures/speciation_co2.csv")
        val fractions = CountryMask.bandMask(s, srcGrid,
          Seq(("C1", 0.0, 20.5), ("C2", 20.5, 50.0)), fractions = true)
        Speciation.speciateFromTable(s, emissionsAgg(s, d), fractions, table,
          substance = "F", year = Some(2024), typ = Some("gridded"))
      },
      Some(s"""$EmiAggCte,
        |t AS (SELECT * FROM read_csv('/root/repo/fixtures/speciation_co2.csv')),
        |tt AS (SELECT category, country, CAST(FA AS DOUBLE) AS fa, CAST(FB AS DOUBLE) AS fb
        |       FROM t WHERE year = 2024 AND type = 'gridded'),
        |tl AS (SELECT category, country, 'FA' AS new_substance, fa AS ratio FROM tt
        |       UNION ALL
        |       SELECT category, country, 'FB' AS new_substance, fb AS ratio FROM tt),
        |cells AS (SELECT i AS cell_id, (i % 64) * 1.0 AS ymin, (i % 64) + 1.0 AS ymax
        |          FROM range(4096) c(i)),
        |bands AS (SELECT * FROM (VALUES ('C1', 0.0, 20.5), ('C2', 20.5, 50.0))
        |          b(country, bymin, bymax)),
        |fr AS (SELECT cell_id, country,
        |              (least(ymax, bymax) - greatest(ymin, bymin)) / 1.0 AS fraction
        |       FROM cells, bands
        |       WHERE least(ymax, bymax) - greatest(ymin, bymin) > 0),
        |cr AS (SELECT cell_id, tl.category, new_substance, sum(fraction * ratio) AS eff
        |       FROM fr JOIN tl USING (country) GROUP BY 1, 2, 3),
        |dflt AS (SELECT category, new_substance, ratio FROM tl WHERE country = '-99')
        |SELECT e.cell_id, e.category, d.new_substance AS substance,
        |       e.value * coalesce(cr.eff, d.ratio) AS value
        |FROM emi e
        |JOIN dflt d ON d.category = e.category
        |LEFT JOIN cr ON cr.cell_id = e.cell_id AND cr.category = e.category
        |            AND cr.new_substance = d.new_substance
        |WHERE e.substance = 'F'
        |UNION ALL
        |SELECT cell_id, category, substance, value FROM emi
        |WHERE NOT (substance = 'F' AND category IN ('A', 'R'))""".stripMargin)),

    Q("q_merge_substances",
      (s, d) => Speciation.mergeSubstances(s, emissionsAgg(s, d), "TOT", Seq("F", "O")),
      Some(s"""$EmiAggCte
        |SELECT cell_id, category, 'TOT' AS substance, sum(value) AS value
        |FROM emi GROUP BY 1, 2, 3""".stripMargin)),

    // merge_substances drop=False (speciation.py:504-569): the merged
    // total is ADDED while the source substances stay.
    Q("q_merge_nodrop",
      (s, d) => Speciation.mergeSubstancesMap(s, emissionsAgg(s, d),
        Map("TOT" -> Seq("F", "O")), drop = false),
      Some(s"""$EmiAggCte
        |SELECT cell_id, category, substance, value FROM emi
        |UNION ALL
        |SELECT cell_id, category, 'TOT', sum(value)
        |FROM emi WHERE substance IN ('F', 'O') GROUP BY 1, 2""".stripMargin)),

    Q("q_swiss_scale",
      (s, d) => {
        val totals = s.createDataFrame(Seq(
          ("A", "F", 1000.0), ("N", "O", 500.0), ("R", "F", 250.0)))
          .toDF("category", "substance", "total")
        graft.sources.SwissRasters.scaleToTotals(emissionsAgg(s, d), totals)
      },
      Some(s"""$EmiAggCte,
        |t(category, substance, total) AS
        |  (VALUES ('A','F',1000.0), ('N','O',500.0), ('R','F',250.0))
        |SELECT cell_id, emi.category, emi.substance,
        |       value / (sum(value) OVER (PARTITION BY emi.category, emi.substance))
        |             * CAST(total AS DOUBLE) AS value
        |FROM emi JOIN t ON emi.category = t.category AND emi.substance = t.substance""".stripMargin)),

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

  /** Long-format profile table derived deterministically from lineitem:
    * integer-valued weights so every downstream product/sum is exact. */
  private def profileTable(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_suppkey").as("profile_id"), col("l_linenumber").as("pos"))
      .agg(sum("l_quantity").as("w"))

  private val ProfCte: String =
    "WITH prof AS (SELECT l_suppkey AS profile_id, l_linenumber AS pos, " +
      "sum(l_quantity) AS w FROM lineitem GROUP BY 1, 2)"

  /** Queries covering the profile algebra (SURVEY §2.4), temporal machinery
    * (§2.5) and the event-stream operators (§2.6). */
  val profileTemporal: Seq[Q] = Seq(
    Q("q_profile_normalize",
      (s, d) => Profiles.normalize(profileTable(s, d)),
      Some(s"""$ProfCte
        |SELECT profile_id, pos, w / sum(w) OVER (PARTITION BY profile_id) AS ratio
        |FROM prof""".stripMargin)),

    Q("q_combine_weighted",
      (s, d) => {
        val w = supplier(s, d).select(
          col("s_nationkey").as("group"),
          col("s_suppkey").as("member"),
          (col("s_suppkey") % 5 + 1).as("weight"))
        Profiles.combineWeighted(w, profileTable(s, d).withColumnRenamed("profile_id", "member"))
      },
      Some(s"""$ProfCte,
        |wts AS (SELECT s_nationkey AS grp, s_suppkey AS member, s_suppkey % 5 + 1 AS weight
        |        FROM supplier),
        |m AS (SELECT grp, pos, sum(weight * w) AS cw
        |      FROM wts JOIN prof ON prof.profile_id = wts.member GROUP BY 1, 2)
        |SELECT grp AS "group", pos, cw / sum(cw) OVER (PARTITION BY grp) AS ratio
        |FROM m""".stripMargin)),

    Q("q_dedup_vectors",
      (s, d) => Profiles.dedupVectors(
        lineitem(s, d)
          .groupBy(col("l_suppkey").as("profile_id"), col("l_linenumber").as("pos"))
          .agg(sum("l_quantity").cast("long").as("qw"))),
      Some("""WITH prof AS (SELECT l_suppkey AS profile_id, l_linenumber AS pos,
        |                     CAST(sum(l_quantity) AS BIGINT) AS qw
        |              FROM lineitem GROUP BY 1, 2),
        |vecs AS (SELECT profile_id, string_agg(pos || ':' || qw, ',' ORDER BY pos) AS vec
        |         FROM prof GROUP BY profile_id)
        |SELECT profile_id, dense_rank() OVER (ORDER BY vec) AS dedup_id FROM vecs""".stripMargin)),

    Q("q_merge_indexes",
      (s, d) => {
        val base = emissionsAgg(s, d).select("category", "substance").distinct()
          .withColumn("profile_id", lit(1))
        val overrides = s.createDataFrame(Seq(("A", "F", 7), ("N", "O", 9)))
          .toDF("category", "substance", "profile_id")
        Profiles.mergeIndexes(base, overrides, Seq("category", "substance"))
      },
      Some(s"""$EmiAggCte,
        |base AS (SELECT DISTINCT category, substance, 1 AS profile_id FROM emi),
        |ov AS (SELECT * FROM (VALUES ('A','F',7), ('N','O',9)) t(category, substance, profile_id))
        |SELECT base.category, base.substance,
        |       coalesce(ov.profile_id, base.profile_id) AS profile_id
        |FROM base LEFT JOIN ov ON base.category = ov.category AND base.substance = ov.substance""".stripMargin)),

    Q("q_hour_of_week_sf",
      (s, _) => {
        val daily = s.range(24).select(
          col("id").cast("int").as("pos"), ((col("id") + 1) / lit(300.0)).as("ratio"))
        val weekly = s.range(7).select(
          col("id").cast("int").as("pos"), ((col("id") + 1) / lit(28.0)).as("ratio"))
        Temporal.hourOfWeekScalingFactors(s, daily, weekly)
      },
      Some("""WITH d AS (SELECT i AS h, ((i + 1) / 300.0) * 24.0 AS sf_d FROM range(24) t(i)),
        |w AS (SELECT j AS dw, ((j + 1) / 28.0) * 7.0 AS sf_w FROM range(7) t(j)),
        |spine AS (SELECT i AS hour_of_week FROM range(168) t(i))
        |SELECT CAST(hour_of_week AS INT) AS hour_of_week, sf_d * sf_w AS sf
        |FROM spine JOIN d ON hour_of_week % 24 = d.h JOIN w ON hour_of_week // 24 = w.dw""".stripMargin)),

    Q("q_icon_assembly",
      (s, _) => {
        val catsubs = s.createDataFrame(Seq(
          ("A", "F", "co2_anthro"), ("N", "O", "nox")))
          .toDF("category", "substance", "var")
        val indexes = s.createDataFrame(Seq(
          ("A", "F", 10, 1), ("A", "F", 20, 2), ("N", "O", 10, 3), ("N", "O", 20, 1)))
          .toDF("category", "substance", "tpid", "profile_id")
        val regions = s.createDataFrame(Seq((0, 10, 0), (1, 10, 2), (2, 20, -1)))
          .toDF("region_id", "tpid", "tz_shift")
        def prof(kind: String, n: Int) =
          s.range(n).select(col("id").cast("int").as("pos"))
            .crossJoin(s.createDataFrame(Seq(1, 2, 3).map(Tuple1(_))).toDF("profile_id"))
            .select(col("profile_id"), lit(kind).as("kind"), col("pos"),
              ((col("profile_id") * 100 + col("pos") + 1) / lit(1000.0)).as("ratio"))
        val profiles = prof("hour_of_day", 24)
          .unionByName(prof("day_of_week", 7))
          .unionByName(prof("month", 12))
        graft.sinks.IconExport.assembleTimeProfiles(
          s, catsubs, indexes, regions, profiles)
      },
      Some("""WITH regions(region_id, tpid, tz) AS (VALUES (0, 10, 0), (1, 10, 2), (2, 20, -1)),
        |idx(category, substance, tpid, profile_id) AS
        |  (VALUES ('A','F',10,1), ('A','F',20,2), ('N','O',10,3), ('N','O',20,1)),
        |catsubs(category, substance, var) AS
        |  (VALUES ('A','F','co2_anthro'), ('N','O','nox')),
        |pp(profile_id) AS (VALUES (1), (2), (3)),
        |prof AS (
        |  SELECT profile_id, 'hour_of_day' AS kind, CAST(i AS INT) AS pos,
        |         (profile_id*100 + i + 1)/1000.0 AS ratio FROM range(24) t(i), pp
        |  UNION ALL
        |  SELECT profile_id, 'day_of_week', CAST(i AS INT),
        |         (profile_id*100 + i + 1)/1000.0 FROM range(7) t(i), pp
        |  UNION ALL
        |  SELECT profile_id, 'month', CAST(i AS INT),
        |         (profile_id*100 + i + 1)/1000.0 FROM range(12) t(i), pp)
        |SELECT var, kind, region_id,
        |       CASE WHEN kind = 'hour_of_day' THEN (pos - tz + 24) % 24
        |            ELSE pos END AS pos,
        |       ratio * (CASE kind WHEN 'hour_of_day' THEN 24.0
        |                          WHEN 'day_of_week' THEN 7.0
        |                          ELSE 12.0 END) AS sf
        |FROM catsubs
        |JOIN idx USING (category, substance)
        |JOIN regions USING (tpid)
        |JOIN prof USING (profile_id)""".stripMargin)),

    Q("q_composite_sf",
      (s, _) => {
        val monthProf = s.range(12).where(col("id") =!= 5).select(
          col("id").cast("int").as("pos"), ((col("id") + 1) / lit(78.0)).as("ratio"))
        val weekProf = s.range(7).select(
          col("id").cast("int").as("pos"), ((col("id") + 1) / lit(28.0)).as("ratio"))
        val dailyProf = s.range(24).select(
          col("id").cast("int").as("pos"), ((col("id") + 1) / lit(300.0)).as("ratio"))
        // NB: Column-API lit(300.0) is a DOUBLE; the same literal inside
        // selectExpr would parse as DECIMAL and round the ratio at 6 dp
        val weekendDaily = s.range(24).select(
          col("id").cast("int").as("pos"),
          ((lit(24) - col("id")) / lit(300.0)).as("ratio"))
          .crossJoin(s.createDataFrame(Seq(Tuple1(5), Tuple1(6))).toDF("dow"))
        Temporal.compositeScalingFactors(s,
          "2023-01-01 00:00:00", 8760,
          Seq("month" -> monthProf, "day_of_week" -> weekProf,
            "hour_of_day" -> dailyProf),
          tzShiftHours = 1,
          specificDaily = Some(weekendDaily))
      },
      Some("""WITH spine AS (SELECT CAST(i AS INT) AS h,
        |              TIMESTAMP '2023-01-01 00:00:00' + to_hours(i + 1) AS lts
        |       FROM range(8760) t(i)),
        |m AS (SELECT i AS pos, (i+1)/78.0 AS ratio FROM range(12) t(i) WHERE i <> 5),
        |w AS (SELECT i AS pos, (i+1)/28.0 AS ratio FROM range(7) t(i)),
        |dly AS (SELECT i AS pos, (i+1)/300.0 AS ratio FROM range(24) t(i)),
        |sd AS (SELECT d AS dow, i AS pos, (24-i)/300.0 AS ratio
        |       FROM range(24) t(i), (VALUES (5), (6)) v(d))
        |SELECT h, ((coalesce(m.ratio*12.0, 1.0)) * (coalesce(w.ratio*7.0, 1.0)))
        |          * coalesce(sd.ratio*24.0, dly.ratio*24.0, 1.0) AS sf
        |FROM spine
        |LEFT JOIN m ON month(lts) - 1 = m.pos
        |LEFT JOIN w ON isodow(lts) - 1 = w.pos
        |LEFT JOIN dly ON hour(lts) = dly.pos
        |LEFT JOIN sd ON isodow(lts) - 1 = sd.dow AND hour(lts) = sd.pos""".stripMargin)),

    Q("q_hour3_month_sf",
      (s, _) => {
        // the GFED4 profile pair: 96-slot Hour3OfDayPerMonth × DayOfYear,
        // both sparse so the missing-kind=1.0 rule is exercised
        val h3m = s.range(96).where(col("id") % 5 =!= 0).select(
          col("id").cast("int").as("pos"), ((col("id") + 1) / lit(4656.0)).as("ratio"))
        val doy = s.range(365).where(col("id") % 3 === 0).select(
          col("id").cast("int").as("pos"), ((col("id") + 1) / lit(66795.0)).as("ratio"))
        Temporal.compositeScalingFactors(s,
          "2023-01-01 00:00:00", 2160,
          Seq("hour3_of_day_per_month" -> h3m, "day_of_year" -> doy))
      },
      Some("""WITH spine AS (SELECT CAST(i AS INT) AS h,
        |              TIMESTAMP '2023-01-01 00:00:00' + to_hours(i) AS lts
        |       FROM range(2160) t(i)),
        |h3m AS (SELECT i AS pos, (i+1)/4656.0 AS ratio FROM range(96) t(i)
        |        WHERE i % 5 <> 0),
        |doy AS (SELECT i AS pos, (i+1)/66795.0 AS ratio FROM range(365) t(i)
        |        WHERE i % 3 = 0),
        |SEL AS (SELECT h,
        |          coalesce(h3m.ratio*96.0, 1.0) * coalesce(doy.ratio*365.0, 1.0) AS sf
        |        FROM spine
        |        LEFT JOIN h3m ON (month(lts) - 1) * 8 + hour(lts) // 3 = h3m.pos
        |        LEFT JOIN doy ON dayofyear(lts) - 1 = doy.pos)
        |SELECT h, sf FROM SEL""".stripMargin)),

    Q("q_how_month_sf",
      (s, _) => {
        // hour_of_week (168) × hour_of_week_per_month (2016) — the two
        // profile kinds the reference's composite path supports beyond
        // the per-day/per-month family; both sparse so missing-kind=1.0
        // is exercised across month boundaries
        val how = s.range(168).where(col("id") % 4 =!= 1).select(
          col("id").cast("int").as("pos"), ((col("id") + 1) / lit(14196.0)).as("ratio"))
        val howm = s.range(2016).where(col("id") % 7 =!= 3).select(
          col("id").cast("int").as("pos"), ((col("id") + 1) / lit(2033136.0)).as("ratio"))
        Temporal.compositeScalingFactors(s,
          "2023-01-01 00:00:00", 2160,
          Seq("hour_of_week" -> how, "hour_of_week_per_month" -> howm))
      },
      Some("""WITH spine AS (SELECT CAST(i AS INT) AS h,
        |              TIMESTAMP '2023-01-01 00:00:00' + to_hours(i) AS lts
        |       FROM range(2160) t(i)),
        |how AS (SELECT i AS pos, (i+1)/14196.0 AS ratio FROM range(168) t(i)
        |        WHERE i % 4 <> 1),
        |howm AS (SELECT i AS pos, (i+1)/2033136.0 AS ratio FROM range(2016) t(i)
        |         WHERE i % 7 <> 3)
        |SELECT h,
        |       coalesce(how.ratio*168.0, 1.0) * coalesce(howm.ratio*2016.0, 1.0) AS sf
        |FROM spine
        |LEFT JOIN how ON (isodow(lts) - 1) * 24 + hour(lts) = how.pos
        |LEFT JOIN howm ON (month(lts) - 1) * 168 + (isodow(lts) - 1) * 24 + hour(lts)
        |                  = howm.pos""".stripMargin)),

    Q("q_temporal_explode",
      (s, d) => {
        val emi = emissionsAgg(s, d).where(col("cell_id") < 256)
        val sf = s.range(24).select(
          lit("A").as("category"), lit("F").as("substance"),
          col("id").cast("int").as("hour_of_day"),
          (lit(1.0) + col("id") / lit(48.0)).as("sf"))
        Temporal.temporalExplode(emi, sf, "2024-01-01 00:00:00", 24)
      },
      Some(s"""$EmiAggCte,
        |sf AS (SELECT 'A' AS category, 'F' AS substance, CAST(i AS INT) AS hour_of_day,
        |              1.0 + i / 48.0 AS sf FROM range(24) t(i)),
        |spine AS (SELECT i AS h FROM range(24) t(i))
        |SELECT e.cell_id, e.category, e.substance,
        |       strftime(TIMESTAMP '2024-01-01 00:00:00' + to_hours(h), '%Y-%m-%d %H:%M:%S') AS ts_str,
        |       e.value * coalesce(sf.sf, 1.0) AS value
        |FROM (SELECT * FROM emi WHERE cell_id < 256) e
        |CROSS JOIN spine
        |LEFT JOIN sf ON sf.category = e.category AND sf.substance = e.substance
        |            AND sf.hour_of_day = h""".stripMargin)),

    Q("q_interpolate_monthly",
      (s, _) => Temporal.interpolateMonthlyToDaily(s,
        s.range(12).select(
          (col("id") + 1).cast("int").as("month"),
          ((col("id") + 1) * (col("id") + 1)).cast("int").as("v"))),
      Some("""WITH m AS (SELECT CAST(i + 1 AS INT) AS month, CAST((i + 1) * (i + 1) AS INT) AS v
        |              FROM range(12) t(i)),
        |days AS (SELECT CAST(i AS INT) AS day FROM range(360) t(i)),
        |j AS (SELECT day, least(10, greatest(0, CAST(floor((day - 15) / 30.0) AS INT))) AS k
        |      FROM days)
        |SELECT day, CASE WHEN day < 15 THEN a0.v WHEN day >= 345 THEN a1.v
        |            ELSE a0.v + (a1.v - a0.v) * ((day - (k * 30 + 15)) / 30.0) END AS y
        |FROM j JOIN m a0 ON a0.month = k + 1 JOIN m a1 ON a1.month = k + 2""".stripMargin)),

    Q("q_hdd_scaling",
      (s, d) => Temporal.hddScaling(events(s, d)),
      Some("""WITH daily AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |                      round(avg(value), 6) AS t_mean
        |               FROM events GROUP BY 1),
        |h AS (SELECT day, t_mean, greatest(0.0, 200.0 - t_mean) AS hdd FROM daily),
        |t AS (SELECT round(sum(hdd), 6) AS hdd_total FROM h)
        |SELECT day, t_mean, hdd, round(hdd / hdd_total, 9) AS hdd_ratio FROM h, t""".stripMargin)),

    Q("q_hdd_hourly",
      (s, d) => {
        val heat = s.range(24).select(
          col("id").cast("int").as("pos"), ((col("id") + 1) / lit(300.0)).as("ratio"))
        val dhw = s.range(24).select(
          col("id").cast("int").as("pos"), ((lit(24) - col("id")) / lit(300.0)).as("ratio"))
        Temporal.hddHourlyBlend(events(s, d), heat, dhw,
          hours = 72, tzShiftHours = 1)
      },
      Some("""WITH daily AS (SELECT date_trunc('day', ts) AS day,
        |              round(avg(value), 6) AS t_mean FROM events GROUP BY 1),
        |hh AS (SELECT day, year(day) AS yr,
        |              CASE WHEN t_mean < 200.0 THEN 220.0 - t_mean ELSE 0.0 END AS hdd
        |       FROM daily),
        |ym AS (SELECT yr, round(avg(hdd), 6) AS ym FROM hh GROUP BY 1),
        |ad AS (SELECT day, round(hdd / ym, 6) AS a_hdd FROM hh JOIN ym USING (yr)),
        |s0 AS (SELECT date_trunc('day', min(ts)) AS start0 FROM events),
        |spine AS (SELECT start0 + to_hours(i) AS ts FROM s0, range(72) t(i)),
        |ff AS (SELECT spine.ts, ad.a_hdd AS a
        |       FROM spine ASOF LEFT JOIN ad ON spine.ts >= ad.day),
        |hp AS (SELECT i AS pos, (i + 1) / 300.0 * 24.0 AS hsf FROM range(24) t(i)),
        |dp AS (SELECT i AS pos, (24 - i) / 300.0 * 24.0 AS dsf FROM range(24) t(i))
        |SELECT strftime(ff.ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |       (1.0 - 0.25) * (a * hsf) + 0.25 * dsf AS sf
        |FROM ff
        |JOIN hp ON hour(ff.ts + to_hours(1)) = hp.pos
        |JOIN dp ON hour(ff.ts + to_hours(1)) = dp.pos""".stripMargin)),

    Q("q_vertical_resample",
      (s, d) => VerticalProfiles.resample(s,
        lineitem(s, d).groupBy(
          (col("l_suppkey") % 20).as("profile_id"),
          (col("l_linenumber") - 1).as("level"))
          .agg(sum("l_quantity").as("r")),
        srcEdges = Seq(0, 10, 20, 30, 40, 50, 60, 70).map(_.toDouble),
        dstEdges = Seq(0.0, 15.0, 35.0, 70.0)),
      Some("""WITH prof AS (SELECT l_suppkey % 20 AS profile_id, l_linenumber - 1 AS level,
        |                     sum(l_quantity) AS r
        |              FROM lineitem GROUP BY 1, 2),
        |src AS (SELECT i AS src_level, i * 10.0 AS slo, (i + 1) * 10.0 AS shi FROM range(7) t(i)),
        |dst AS (SELECT * FROM (VALUES (0, 0.0, 15.0), (1, 15.0, 35.0), (2, 35.0, 70.0))
        |        d(dst_level, dlo, dhi)),
        |w AS (SELECT src_level, dst_level,
        |             (least(shi, dhi) - greatest(slo, dlo)) / (shi - slo) AS weight
        |      FROM src, dst WHERE least(shi, dhi) - greatest(slo, dlo) > 0)
        |SELECT profile_id, dst_level AS level, sum(r * weight) AS r
        |FROM prof JOIN w ON prof.level = w.src_level GROUP BY 1, 2""".stripMargin)),

    Q("q_remap_profiles",
      (s, d) => {
        val cellProfiles = lineitem(s, d)
          .groupBy((col("l_orderkey") % 4096).as("cell_id"),
            col("l_linenumber").as("pos"))
          .agg(sum("l_quantity").as("ratio"))
        val cellWeights = emissionsAgg(s, d)
          .groupBy("cell_id").agg(sum("value").as("w"))
        Profiles.remapProfiles(cellProfiles, cellWeights,
          Regrid.weights(s, srcGrid, dstGrid))
      },
      Some(s"""$EmiAggCte,
        |$WeightsCte,
        |cp AS (SELECT l_orderkey % 4096 AS cell_id, l_linenumber AS pos,
        |              sum(l_quantity) AS ratio
        |       FROM lineitem GROUP BY 1, 2),
        |cw AS (SELECT cell_id, sum(value) AS w FROM emi GROUP BY 1),
        |m AS (SELECT w.dst_cell AS cell_id, cp.pos,
        |             sum(cp.ratio * cw.w * w.weight) AS cw
        |      FROM cp JOIN cw USING (cell_id) JOIN w ON w.src_cell = cp.cell_id
        |      GROUP BY 1, 2)
        |SELECT cell_id, pos, cw / sum(cw) OVER (PARTITION BY cell_id) AS ratio
        |FROM m""".stripMargin)),

    Q("q_pad_missing_cells",
      (s, d) => {
        val index = emissionsAgg(s, d).select("cell_id").distinct()
          .where(col("cell_id") % 3 === 0)
          .withColumn("profile_id", (col("cell_id") % 7).cast("int"))
        Profiles.padMissingCells(s, index, srcGrid.ncells)
      },
      Some(s"""$EmiAggCte,
        |idx AS (SELECT DISTINCT cell_id, CAST(cell_id % 7 AS INT) AS profile_id
        |        FROM emi WHERE cell_id % 3 = 0)
        |SELECT c.cell_id, coalesce(idx.profile_id, -1) AS profile_id
        |FROM (SELECT i AS cell_id FROM range(4096) t(i)) c
        |LEFT JOIN idx USING (cell_id)""".stripMargin)),

    Q("q_vertical_violations",
      (s, d) => VerticalProfiles.violations(
        lineitem(s, d).groupBy(
          col("l_suppkey").as("profile_id"), col("l_linenumber").as("level"))
          .agg(sum("l_quantity").as("r"))),
      Some("""WITH prof AS (SELECT l_suppkey AS profile_id, l_linenumber AS level,
        |                     sum(l_quantity) AS r
        |              FROM lineitem GROUP BY 1, 2)
        |SELECT profile_id, sum(r) AS ratio_sum,
        |       CAST(sum(CASE WHEN r < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative
        |FROM prof GROUP BY 1
        |HAVING abs(sum(r) - 1.0) > 1e-9 OR sum(CASE WHEN r < 0 THEN 1 ELSE 0 END) > 0""".stripMargin)),

    // T7 leap-year rules, both of them: the profile code path's
    // intentional %4-only check (profiles.py:277-284) and
    // get_day_per_year's full Gregorian rule (utilities.py:38-46) —
    // the 1900/2100 rows are exactly where they diverge.
    Q("q_leap_days",
      (s, _) => s.range(1896, 2105)
        .select(col("id").cast("int").as("year"))
        .select(col("year"),
          Temporal.isLeapRef(col("year")).as("leap_ref"),
          Temporal.dayPerYear(col("year")).cast("int").as("days")),
      Some("""SELECT i::INT AS year, (i % 4 = 0) AS leap_ref,
        |       (CASE WHEN i % 4 = 0 AND (i % 100 <> 0 OR i % 400 = 0)
        |             THEN 366 ELSE 365 END)::INT AS days
        |FROM range(1896, 2105) t(i)""".stripMargin)),

    // P3 group_profiles_indexes (profiles/operators.py group+combine):
    // per-(group, key) weighted combine of the member categories'
    // profiles, renormalized, with dense 1-based ids ordered by
    // (group, key) and -1 for combinations that have no profile. All
    // aggregation is over integer-valued doubles → the single final
    // division is bit-identical on both engines.
    Q("q_group_profiles",
      (s, d) => {
        val profiles = profileTable(s, d)
          .withColumnRenamed("w", "ratio")
        val index = supplier(s, d)
          .groupBy(concat(lit("c"), col("s_suppkey") % 4).as("category"),
            col("s_nationkey").as("key"))
          .agg(max(col("s_suppkey") % 20).as("profile_id"))
        val weights = supplier(s, d)
          .groupBy(concat(lit("c"), col("s_suppkey") % 4).as("category"),
            col("s_nationkey").as("key"))
          .agg(sum(col("s_suppkey") % 7 + 1).as("weight"))
        val groups = Map("g0" -> Seq("c0", "c1"), "g1" -> Seq("c2", "c3"))
        val (np, ni) = Profiles.groupProfilesIndexes(
          profiles, index, weights, groups)
        ni.join(np, Seq("profile_id"), "left")
          .select(col("category"), col("key"), col("profile_id"),
            coalesce(col("pos"), lit(-1)).as("pos"),
            coalesce(col("ratio"), lit(0.0)).as("ratio"))
      },
      Some(s"""$ProfCte,
        |idx AS (SELECT 'c' || (s_suppkey % 4) AS category, s_nationkey AS key,
        |               max(s_suppkey % 20) AS profile_id
        |        FROM supplier GROUP BY 1, 2),
        |wts AS (SELECT 'c' || (s_suppkey % 4) AS category, s_nationkey AS key,
        |               sum(s_suppkey % 7 + 1) AS weight
        |        FROM supplier GROUP BY 1, 2),
        |gd AS (SELECT * FROM (VALUES ('c0', 'g0'), ('c1', 'g0'),
        |        ('c2', 'g1'), ('c3', 'g1')) g(category, grp)),
        |comb AS (SELECT grp, key, pos, sum(p.w * w.weight) AS rw
        |         FROM idx i JOIN gd USING (category)
        |         JOIN wts w USING (category, key)
        |         JOIN prof p ON p.profile_id = i.profile_id
        |         WHERE i.profile_id <> -1 GROUP BY 1, 2, 3),
        |norm AS (SELECT grp, key, pos,
        |                rw / sum(rw) OVER (PARTITION BY grp, key) AS ratio
        |         FROM comb),
        |ids AS (SELECT grp, key,
        |               (dense_rank() OVER (ORDER BY grp, key))::INT AS profile_id
        |        FROM (SELECT DISTINCT grp, key FROM norm)),
        |np AS (SELECT ids.profile_id, norm.pos, norm.ratio
        |       FROM norm JOIN ids USING (grp, key)),
        |nidx AS (SELECT gs.grp AS category, ks.key,
        |                coalesce(ids.profile_id, -1) AS profile_id
        |         FROM (SELECT DISTINCT key FROM idx) ks
        |         CROSS JOIN (SELECT DISTINCT grp FROM gd) gs
        |         LEFT JOIN ids ON ids.grp = gs.grp AND ids.key = ks.key)
        |SELECT nidx.category, nidx.key, nidx.profile_id,
        |       coalesce(np.pos, -1) AS pos, coalesce(np.ratio, 0.0) AS ratio
        |FROM nidx LEFT JOIN np USING (profile_id)""".stripMargin)),

    // P7 add_profiles (operators.py:700-713): weighted union of two
    // profile sets, renormalized per category. Integer ratio sources and
    // dyadic per-category weights keep every aggregate exact; the single
    // final division matches bit-for-bit.
    Q("q_add_profiles",
      (s, d) => {
        def side(parity: Int) = lineitem(s, d)
          .where(col("l_partkey") % 2 === parity)
          .groupBy(col("l_returnflag").as("category"),
            col("l_linenumber").as("pos"))
          .agg(sum("l_quantity").as("ratio"))
        val w1 = s.createDataFrame(Seq(("A", 1.0), ("N", 2.0), ("R", 4.0)))
          .toDF("category", "w")
        val w2 = s.createDataFrame(Seq(("A", 2.0), ("N", 1.0), ("R", 1.0)))
          .toDF("category", "w")
        Profiles.addProfiles(side(0), w1, side(1), w2)
      },
      Some("""WITH s0 AS (SELECT l_returnflag AS category, l_linenumber AS pos,
        |              sum(l_quantity) AS ratio
        |       FROM lineitem WHERE l_partkey % 2 = 0 GROUP BY 1, 2),
        |s1 AS (SELECT l_returnflag AS category, l_linenumber AS pos,
        |              sum(l_quantity) AS ratio
        |       FROM lineitem WHERE l_partkey % 2 = 1 GROUP BY 1, 2),
        |w1 AS (SELECT * FROM (VALUES ('A', 1.0), ('N', 2.0), ('R', 4.0)) t(category, w)),
        |w2 AS (SELECT * FROM (VALUES ('A', 2.0), ('N', 1.0), ('R', 1.0)) t(category, w)),
        |m AS (SELECT category, pos, sum(rw) AS cw FROM (
        |        SELECT s0.category, pos, ratio * w AS rw FROM s0 JOIN w1 USING (category)
        |        UNION ALL
        |        SELECT s1.category, pos, ratio * w AS rw FROM s1 JOIN w2 USING (category))
        |      GROUP BY 1, 2)
        |SELECT category, pos,
        |       cw / sum(cw) OVER (PARTITION BY category) AS ratio
        |FROM m""".stripMargin)),

    // P12 composite pack/unpack (composite.py:375-436): long → ordered
    // ratio vectors → long again must be the identity on the input.
    Q("q_composite_roundtrip",
      (s, d) => Profiles.fromComposite(Profiles.toComposite(
        lineitem(s, d)
          .groupBy((col("l_suppkey") % 10).as("profile_id"),
            col("l_linestatus").as("kind"),
            (col("l_linenumber") - 1).cast("int").as("pos"))
          .agg(sum("l_quantity").as("ratio")))),
      Some("""SELECT l_suppkey % 10 AS profile_id, l_linestatus AS kind,
        |       (l_linenumber - 1)::INT AS pos, sum(l_quantity) AS ratio
        |FROM lineitem GROUP BY 1, 2, 3""".stripMargin)),

    // P14 index validation + most-specific lookup (profiles/utils.py:
    // 54-93 check_valid_indexes, :95-151 get_desired_profile_index) over
    // a literal index cube — the oracle is the hand-derived answer.
    Q("q_index_lookup",
      (s, _) => {
        val index = s.createDataFrame(Seq[(String, String, Int)](
          (null, null, 0), ("heating", null, 1), (null, "CO2", 2),
          ("heating", "CO2", 3), ("traffic", "NOx", 9)))
          .toDF("category", "substance", "profile_id")
        val profiles = s.range(4).select(
          col("id").cast("int").as("profile_id"),
          lit(0).as("pos"), lit(1.0).as("ratio"))
        val inv = Profiles.invalidIndexes(index, profiles)
          .select(lit("invalid").as("src"), col("category"),
            col("substance"), col("profile_id"),
            lit(-1).as("specificity"))
        val lk = Profiles.lookupIndex(index, Some("heating"), Some("CO2"))
          .select(lit("lookup").as("src"), col("category"),
            col("substance"), col("profile_id"), col("specificity"))
        inv.unionByName(lk)
      },
      Some("""SELECT * FROM (VALUES
        |  ('invalid', 'traffic', 'NOx', 9, -1),
        |  ('lookup', NULL, NULL, 0, 0),
        |  ('lookup', 'heating', NULL, 1, 1),
        |  ('lookup', NULL, 'CO2', 2, 1),
        |  ('lookup', 'heating', 'CO2', 3, 2)
        |) AS t(src, category, substance, profile_id, specificity)""".stripMargin)),

    // S11 YAML temporal profiles (reference from_yaml, emiproc/profiles/
    // temporal/io.py:211-281) over the committed hand-authored fixture.
    // The oracle is INDEPENDENT (not an engine-output pin): it re-derives
    // the expected long table from the fixture's by-hand contents — key
    // aliasing (daily→hour_of_day, weekly→day_of_week, monthly→month),
    // diurn_saturday as a specific-day profile, block + flow lists, and
    // the unknown-key skip. All ratios dyadic → FP-exact compare.
    Q("q_profile_yaml",
      (s, _) => graft.sources.ProfilesYaml
        .read(s, "/root/repo/fixtures/profiles.yaml")
        .select(col("kind"),
          coalesce(col("specific_day"), lit("all")).as("specific_day"),
          col("pos"), col("ratio")),
      Some("""SELECT 'hour_of_day' AS kind, 'all' AS specific_day, i::INT AS pos,
        |       CASE WHEN i < 16 THEN 0.03125 ELSE 0.0625 END AS ratio
        |FROM range(24) t(i)
        |UNION ALL
        |SELECT 'day_of_week', 'all', i::INT,
        |       CASE WHEN i < 2 THEN 0.25 WHEN i < 5 THEN 0.125 ELSE 0.0625 END
        |FROM range(7) t(i)
        |UNION ALL
        |SELECT 'month', 'all', i::INT,
        |       CASE WHEN i < 8 THEN 0.0625 ELSE 0.125 END
        |FROM range(12) t(i)
        |UNION ALL
        |SELECT 'hour_of_day', 'saturday', i::INT,
        |       CASE WHEN i < 8 THEN 0.0625 ELSE 0.03125 END
        |FROM range(24) t(i)""".stripMargin))
  )

  /** Event-stream operator queries (SURVEY §2.6 additions). */
  val eventOps: Seq[Q] = Seq(
    Q("q_funnel",
      (s, d) => Events.funnel(events(s, d), "view", "purchase", windowMinutes = 120),
      Some("""WITH pu AS (SELECT user_id,
        |              min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS a_us,
        |              min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS b_any_us
        |       FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1)
        |SELECT CAST(sum(CASE WHEN a_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_step_a,
        |       CAST(sum(CASE WHEN a_us IS NOT NULL AND b_any_us IS NOT NULL
        |                      AND b_any_us > a_us AND b_any_us - a_us <= 7200000000
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
        |FROM pu""".stripMargin)),

    Q("q_retention_cohorts",
      (s, d) => Events.retentionCohorts(events(s, d)),
      Some("""WITH fd AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        |             FROM events GROUP BY 1),
        |act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS activity_day FROM events)
        |SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort,
        |       CAST(activity_day - cohort_day AS INT) AS day_offset,
        |       count(*) AS n_users
        |FROM act JOIN fd USING (user_id)
        |GROUP BY 1, 2""".stripMargin)),

    Q("q_sessionize",
      (s, d) => Events.sessionize(events(s, d), gapMinutes = 30),
      Some("""WITH e AS (SELECT user_id, ts, event_id,
        |              lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |       FROM events),
        |m AS (SELECT *, CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
        |                     THEN 1 ELSE 0 END AS new_session FROM e),
        |se AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM m)
        |SELECT user_id, session_seq, count(*) AS n_events, min(event_id) AS first_event,
        |       max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us
        |FROM se GROUP BY 1, 2""".stripMargin)),

    // M11 via the BUILT-IN session_window (Spark 3.2+) — the
    // preference-order case (a): the native operator expresses gap
    // sessionization directly, so the custom-state path
    // (Events.sessionize / StreamingOps.sessionizeStream) is needed
    // only where per-session custom state matters. NOTE the boundary
    // difference: session_window closes at gap ≥ g (window end
    // exclusive), the reference-style sessionize at gap > g — the
    // oracle replays the ≥ semantics.
    Q("q_session_window",
      (s, d) => events(s, d)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 6).as("total_value"))
        .select(col("user_id"),
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"), col("total_value")),
      Some("""WITH e AS (SELECT user_id, ts, value, epoch_us(ts) AS us,
        |              lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |       FROM events),
        |m AS (SELECT *, CASE WHEN prev IS NULL OR us - prev >= 1800000000
        |                     THEN 1 ELSE 0 END AS brk FROM e),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                 ROWS UNBOUNDED PRECEDING) AS seq FROM m)
        |SELECT user_id,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
        |       count(*) AS n_events, round(sum(value), 6) AS total_value
        |FROM s GROUP BY user_id, seq""".stripMargin)),

    Q("q_hourly_windows",
      (s, d) => Events.hourlyWindows(events(s, d)),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |       event_type, count(*) AS n, round(sum(value), 6) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin)),

    // M12 streaming gate: the SAME hourly tumbling-window aggregate, but
    // executed as a real Structured Streaming query — events.parquet read
    // through readStream, StreamingOps.hourlyWindows (window() + 2h
    // watermark), memory sink in Complete mode, drained with
    // processAllAvailable. The DuckDB oracle is the batch equivalent, so
    // the incremental execution is hash-verified against it. Complete
    // mode is gate-only (bounded input, re-emits every window): the
    // production path is Append + watermark into hourlyNcSink, where
    // state stays watermark-bounded.
    Q("q_stream_hourly",
      (s, d) => {
        // events.parquet is a single file: stream the parent dir with a
        // glob filter (the streaming file source wants a directory)
        val schema = Tables.table(s, d, "events").schema
        val stream = Tables.normalizeEventTs(s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(d))
        val windowed = graft.streaming.StreamingOps.hourlyWindows(stream)
        val mem = "stream_hourly_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        val q = graft.streaming.StreamingOps.startSized(s) {
          windowed.writeStream
            .outputMode("complete").format("memory").queryName(mem).start()
        }
        try { q.processAllAvailable() } finally { q.stop() }
        s.table(mem).select(
          date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"), col("n"),
          round(col("total_value"), 6).as("total_value"))
      },
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |       event_type, count(*) AS n, round(sum(value), 6) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin)),

    // M21 streaming near-dup gate: the stateful LSH candidate stream over
    // documents read as a stream — row-local signatures,
    // flatMapGroupsWithState keyed by band bucket. Deterministic on
    // bounded input: one file → one batch, per-bucket processing sorts by
    // doc_id. Distinct output (a pair can surface once per shared band).
    // The DuckDB oracle is the batch LSH-pair SQL (q_lsh_pairs) plus the
    // stream's est ≥ threshold filter — exact because the bucket cap (50)
    // never trips at gate scale (max bucket 4), so the incremental path
    // is hash-verified against the batch semantics.
    Q("q_stream_neardup",
      (s, d) => {
        val schema = Tables.table(s, d, "documents").schema
        val stream = s.readStream.schema(schema)
          .option("pathGlobFilter", "documents.parquet").parquet(d)
        val cand = graft.streaming.StreamingOps.lshCandidateStream(
          stream, numHashes = 8, rowsPerBand = 2, threshold = 0.5,
          maxBucketSize = 50)
        val mem = "stream_neardup_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        val q = graft.streaming.StreamingOps.startSized(s) {
          cand.toDF().writeStream
            .outputMode("append").format("memory").queryName(mem).start()
        }
        try { q.processAllAvailable() } finally { q.stop() }
        s.table(mem).select("doc_a", "doc_b", "est_jaccard").distinct()
      },
      Some(s"""WITH ${QueriesML.ShingleHashCte},
        |keys AS (SELECT doc_id, hash_id // 2 AS band,
        |                string_agg(hash_id || ':' || minhash, ',' ORDER BY hash_id) AS band_key
        |         FROM mh GROUP BY 1, 2),
        |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |          FROM keys a JOIN keys b
        |            ON a.band = b.band AND a.band_key = b.band_key
        |           AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b,
        |       sum(CASE WHEN ma.minhash = mb.minhash THEN 1 ELSE 0 END) / 8.0 AS est_jaccard
        |FROM pairs
        |JOIN mh ma ON ma.doc_id = doc_a
        |JOIN mh mb ON mb.doc_id = doc_b AND mb.hash_id = ma.hash_id
        |GROUP BY 1, 2
        |HAVING sum(CASE WHEN ma.minhash = mb.minhash THEN 1 ELSE 0 END) / 8.0 >= 0.5""".stripMargin)),

    // M12 stateful-session gate: flatMapGroupsWithState sessionization
    // over the events stream. Only sessions CLOSED by a later event emit
    // (the open tail per user stays in state) — a deterministic subset of
    // the batch q_sessionize result, so the DuckDB oracle is the batch
    // session SQL minus each user's last session.
    Q("q_stream_sessions",
      (s, d) => {
        val schema = Tables.table(s, d, "events").schema
        val stream = Tables.normalizeEventTs(s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(d))
        val sessions = graft.streaming.StreamingOps.sessionizeStream(
          stream, gapMinutes = 30)
        val mem = "stream_sessions_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        val q = graft.streaming.StreamingOps.startSized(s) {
          sessions.toDF().writeStream
            .outputMode("append").format("memory").queryName(mem).start()
        }
        try { q.processAllAvailable() } finally { q.stop() }
        s.table(mem)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_sessions"),
            sum("n_events").as("n_events"),
            sum("duration_us").as("total_duration_us"),
            min("first_event").as("first_event"))
      },
      Some("""WITH e AS (SELECT user_id, ts, event_id,
        |              lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |       FROM events),
        |m AS (SELECT *, CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
        |                     THEN 1 ELSE 0 END AS new_session FROM e),
        |se AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM m),
        |sess AS (SELECT user_id, session_seq, count(*) AS n_events, min(event_id) AS first_event,
        |                max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us
        |         FROM se GROUP BY 1, 2),
        |mx AS (SELECT user_id, max(session_seq) AS last_seq FROM sess GROUP BY 1)
        |SELECT s.user_id, count(*) AS n_sessions, CAST(sum(s.n_events) AS BIGINT) AS n_events,
        |       CAST(sum(s.duration_us) AS BIGINT) AS total_duration_us, min(s.first_event) AS first_event
        |FROM sess s JOIN mx USING (user_id) WHERE s.session_seq < mx.last_seq
        |GROUP BY 1""".stripMargin)),

    Q("q_asof_join",
      (s, d) => {
        val ev = events(s, d)
        Events.asofJoin(
          ev.where(col("event_type") === "click"),
          ev.where(col("event_type") === "purchase"))
      },
      Some("""WITH l AS (SELECT user_id, ts, event_id, NULL::BIGINT AS right_id, 1 AS is_left
        |       FROM events WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts, NULL::BIGINT AS event_id, event_id AS right_id, 0 AS is_left
        |      FROM events WHERE event_type = 'purchase'),
        |u AS (SELECT * FROM l UNION ALL SELECT * FROM r)
        |SELECT user_id, event_id, asof_id FROM (
        |  SELECT *, last_value(right_id IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts, is_left, coalesce(event_id, right_id)
        |    ROWS UNBOUNDED PRECEDING) AS asof_id
        |  FROM u) WHERE is_left = 1""".stripMargin))
  )

  def all: Seq[Q] =
    relational ++ profileTemporal ++ eventOps ++ QueriesML.ml ++
      QueriesML.curation ++ QueriesML.crawl ++ QueriesML.training ++
      QueriesExtra.extra ++ QueriesSpatial.spatial
}
