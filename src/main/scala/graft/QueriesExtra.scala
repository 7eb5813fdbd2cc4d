package graft

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ops.CountryMask
import graft.profiles.{Profiles, Temporal}
import graft.multimodal.Multimodal

/** Gate queries for the remaining profile-algebra operators (P5 country→
  * cells, P15 profile regions, T6 day-type resolution) and the multimodal
  * metadata slice. */
object QueriesExtra {

  /** Shared CTE: the y-band country fraction table over the 64×64 grid —
    * mirrors CountryMask.bandMask(fractions = true) with dyadic edges. */
  private val FracCte: String =
    """cellsf AS (SELECT i AS cell_id, (i % 64) * 1.0 AS ymin, (i % 64) + 1.0 AS ymax
      |           FROM range(4096) t(i)),
      |bands AS (SELECT * FROM (VALUES ('C1', 0.0, 20.5), ('C2', 20.5, 43.5), ('C3', 43.5, 64.0))
      |          b(country, bymin, bymax)),
      |fr AS (SELECT cell_id, country,
      |              (least(ymax, bymax) - greatest(ymin, bymin)) / 1.0 AS fraction
      |       FROM cellsf, bands WHERE least(ymax, bymax) - greatest(ymin, bymin) > 0)""".stripMargin

  val extra: Seq[Q] = Seq(
    Q("q_country_to_cells",
      (s, _) => {
        val fr = CountryMask.bandMask(s, srcGrid,
          Seq(("C1", 0.0, 20.5), ("C2", 20.5, 43.5), ("C3", 43.5, 64.0)), fractions = true)
        val factors = s.createDataFrame(Seq(("C1", 1.5), ("C2", 0.5), ("C3", 2.0)))
          .toDF("country", "factor")
        Profiles.countryToCells(fr, factors)
      },
      Some(s"""WITH $FracCte,
        |fac AS (SELECT * FROM (VALUES ('C1', 1.5), ('C2', 0.5), ('C3', 2.0)) f(country, factor))
        |SELECT cell_id, sum(fraction * factor) AS factor
        |FROM fr JOIN fac USING (country) GROUP BY 1""".stripMargin)),

    Q("q_profile_regions",
      (s, _) => {
        val index = s.range(4096)
          .select(col("id").as("cell_id"),
            explode(array(lit("A"), lit("N"), lit("R"))).as("category"))
          .withColumn("profile_id",
            (col("cell_id") + ascii(substring(col("category"), 1, 1))) % 5)
        Profiles.groupCellsByRegions(index)
      },
      Some("""WITH idx AS (SELECT i AS cell_id, c AS category, (i + ascii(c)) % 5 AS profile_id
        |              FROM range(4096) t(i), (VALUES ('A'), ('N'), ('R')) v(c)),
        |vecs AS (SELECT cell_id, string_agg(category || ':' || profile_id, ',' ORDER BY category) AS vec
        |         FROM idx GROUP BY 1)
        |SELECT cell_id, dense_rank() OVER (ORDER BY vec) AS region_id FROM vecs""".stripMargin)),

    Q("q_resolve_daytype",
      (s, _) => {
        val mk = (dt: String, f: Int => Double) =>
          (0 until 24).map(p => (dt, p, f(p)))
        val profiles = s.createDataFrame(
          mk("weekday", p => (p + 1) / 300.0) ++
            mk("saturday", p => (24 - p) / 300.0) ++
            mk("sunday", _ => 1.0 / 24.0))
          .toDF("day_type", "pos", "ratio")
        Temporal.resolveDayType(s, profiles)
      },
      Some("""WITH prof AS (
        |  SELECT 'weekday' AS day_type, p AS pos, (p + 1) / 300.0 AS ratio FROM range(24) t(p)
        |  UNION ALL
        |  SELECT 'saturday', p, (24 - p) / 300.0 FROM range(24) t(p)
        |  UNION ALL
        |  SELECT 'sunday', p, 1.0 / 24.0 FROM range(24) t(p)),
        |spine AS (SELECT CAST(i AS INT) AS hour_of_week, i // 24 AS dow, i % 24 AS pos
        |          FROM range(168) t(i)),
        |dt AS (SELECT hour_of_week, pos,
        |              CASE WHEN dow <= 4 THEN 'weekday'
        |                   WHEN dow = 5 THEN 'saturday' ELSE 'sunday' END AS day_type
        |       FROM spine)
        |SELECT hour_of_week, dt.day_type, ratio * 24.0 AS sf
        |FROM dt JOIN prof ON prof.day_type = dt.day_type AND prof.pos = dt.pos""".stripMargin)),

    Q("q_multimodal_meta",
      (s, d) => Multimodal.metadata(documents(s, d)),
      Some("""WITH m AS (SELECT doc_id, octet_length(encode(text)) AS byte_len FROM documents)
        |SELECT doc_id, 'image/fake' AS media_type, byte_len,
        |       16 + byte_len % 64 AS width,
        |       16 + (byte_len * 7) % 64 AS height,
        |       1 + byte_len // 100 AS n_frames
        |FROM m""".stripMargin))
  )
}
