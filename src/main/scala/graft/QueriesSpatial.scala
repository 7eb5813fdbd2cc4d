package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ops.SpatialJoin

/** Gate queries for the general polygon spatial join (SURVEY §2 R1 full
  * form / M5). Fixture design: polygons are RECTANGLES fed through the
  * generic vertex-array machinery — the engine runs the real tile join +
  * Sutherland–Hodgman clip, while DuckDB reproduces the result closed-form
  * as box∩box arithmetic. Rect sizes are powers of two and offsets sit on
  * the 1/4 lattice, so every clip intersection coordinate and shoelace
  * product is dyadic-exact → bit-identical across engines (the same trick
  * q_line_weights uses for Liang–Barsky). Non-axis-aligned shapes are
  * ALSO oracle-checked: q_crop_polygon and q_hex_remap replicate the
  * Sutherland–Hodgman kernel itself in DuckDB list lambdas (see
  * [[HexRemapOracle]]); SpatialJoinSpec additionally pins the kernels
  * against the reference's hand-computed tables.
  */
object QueriesSpatial {

  /** One Sutherland–Hodgman clip stage against hex edge `k` (kernel
    * iteration order, i.e. AFTER the CCW reversal): half-plane
    * d(V) = edx·(V.y − ey0) − edy·(V.x − ex0) ≥ 0, with the edge taken
    * from the carried corner list `cs`. Emit order and arithmetic mirror
    * `PolyClipKernel.convexClipArea` exactly. */
  private def hexClipStage(prev: String, next: String, k: Int): String = {
    val i = k + 1 // 1-based list index of the edge start
    val j = (k + 1) % 6 + 1
    def d(v: String) =
      s"((cs[$j].x - cs[$i].x) * ($v.y - cs[$i].y) - (cs[$j].y - cs[$i].y) * ($v.x - cs[$i].x))"
    val (da, db) = (d("(e.a)"), d("(e.b)"))
    s"""$next AS MATERIALIZED (SELECT cell_id, dst_id, cs,
       |  CASE WHEN len(vs) < 3 THEN vs ELSE flatten(list_transform(
       |    list_transform(range(1, len(vs) + 1),
       |      i -> {'a': vs[i], 'b': vs[(i % len(vs)) + 1]}),
       |    e -> CASE
       |      WHEN $da >= 0 AND (($da > 0 AND $db < 0) OR ($da < 0 AND $db > 0))
       |        THEN [e.a, {'x': (e.a).x + ($da / ($da - $db)) * ((e.b).x - (e.a).x),
       |                    'y': (e.a).y + ($da / ($da - $db)) * ((e.b).y - (e.a).y)}]
       |      WHEN $da >= 0 THEN [e.a]
       |      WHEN ($da > 0 AND $db < 0) OR ($da < 0 AND $db > 0)
       |        THEN [{'x': (e.a).x + ($da / ($da - $db)) * ((e.b).x - (e.a).x),
       |               'y': (e.a).y + ($da / ($da - $db)) * ((e.b).y - (e.a).y)}]
       |      ELSE [] END)) END AS vs
       |  FROM $prev)""".stripMargin
  }

  /** Full SQL oracle for q_hex_remap: hex corner lattice rebuilt with the
    * SAME Scala-computed double constants the HexGrid Columns bake in,
    * corners listed in the kernel's post-reversal (CCW) order, 6 SH clip
    * stages, shoelace, then the fact join + rollup. The only
    * non-bit-exact step is the cross-cell sum, absorbed by round(…, 6)
    * on both engines. */
  private lazy val HexRemapOracle: String = {
    val grid = graft.model.HexGrid.fromSpacing(-4.0, -4.0, nx = 20, ny = 22,
      spacing = 4.0)
    val (dx, dy, ny) = (grid.dx, grid.dy, grid.ny)
    val h = 1.0 / math.sqrt(3.0)
    val offX = Seq(0.0, 1.0, 1.0, 0.0, -1.0, -1.0)
    val offY = Seq(2 - h, h, -h, -(2 - h), -h, h)
    // the same constant folding the Column code performs
    val xBase = grid.xmin + dx / 2
    val yBase = grid.ymin + dy / 2
    val xOffs = offX.map(o => o * dx / 2)
    val yOffs = offY.map(o => o * dy / 2)
    // the offset ring is clockwise (signed shoelace < 0), so the kernel
    // reverses it — list corners in the post-reversal order 5,4,3,2,1,0
    val order = Seq(5, 4, 3, 2, 1, 0)
    def cornerX(k: Int) = s"(hcx + ${xOffs(k)})"
    def cornerY(k: Int) = s"(hcy + ${yOffs(k)})"
    val cornerList = order
      .map(k => s"{'x': ${cornerX(k)}, 'y': ${cornerY(k)}}")
      .mkString("[", ",\n       |        ", "]")
    val yAbs = yOffs.head // largest |y| offset (corner 0 / 3)
    s"""cells AS MATERIALIZED (SELECT cell_id,
       |            (cell_id // 64) * 1.0 AS bx0, (cell_id % 64) * 1.0 AS by0,
       |            (cell_id // 64) + 1.0 AS bx1, (cell_id % 64) + 1.0 AS by1
       |          FROM (SELECT DISTINCT cell_id FROM emi)),
       |hexes AS MATERIALIZED (SELECT i AS dst_id,
       |            (($xBase + (i // $ny) * $dx) +
       |             (CASE WHEN (i % $ny) % 2 = 1 THEN ${dx / 2} ELSE 0.0 END)) AS hcx,
       |            ($yBase + (i % $ny) * $dy) AS hcy
       |          FROM range(${grid.ncells}) t(i)),
       |pairs AS MATERIALIZED (SELECT cell_id, dst_id,
       |            [{'x': bx0, 'y': by0}, {'x': bx1, 'y': by0},
       |             {'x': bx1, 'y': by1}, {'x': bx0, 'y': by1}] AS vs,
       |            $cornerList AS cs
       |          FROM cells, hexes
       |          WHERE bx0 < hcx + ${xOffs(1)} AND bx1 > hcx - ${xOffs(1)}
       |            AND by0 < hcy + $yAbs AND by1 > hcy - $yAbs),
       |${(0 until 6).map(k => hexClipStage(if (k == 0) "pairs" else s"h$k", s"h${k + 1}", k)).mkString(",\n")},
       |w AS MATERIALIZED (SELECT cell_id, dst_id,
       |        CASE WHEN len(vs) < 3 THEN 0.0 ELSE
       |          abs(list_sum(list_transform(range(1, len(vs) + 1),
       |            i -> vs[i].x * vs[(i % len(vs)) + 1].y
       |               - vs[(i % len(vs)) + 1].x * vs[i].y))) / 2.0
       |        END AS weight
       |      FROM h6)
       |SELECT w.dst_id AS cell_id, category, substance,
       |       round(sum(value * weight), 6) AS value
       |FROM emi JOIN w ON emi.cell_id = w.cell_id
       |WHERE weight > 0
       |GROUP BY 1, 2, 3""".stripMargin
  }

  /** 25 rect polygons derived from nation (4×2, quarter-offset). */
  private def nationPolys(s: SparkSession, d: String): DataFrame =
    nation(s, d).select(
      col("n_nationkey").cast("long").as("poly_id"),
      ((col("n_nationkey") * 7 % 50).cast("double") + 0.25).as("x0"),
      ((col("n_nationkey") * 11 % 50).cast("double") + 0.5).as("y0"))
      .select(col("poly_id"),
        array(col("x0"), col("x0") + 4.0, col("x0") + 4.0, col("x0")).as("xs"),
        array(col("y0"), col("y0"), col("y0") + 2.0, col("y0") + 2.0).as("ys"))

  private val NationPolyCte =
    """np AS (SELECT CAST(n_nationkey AS BIGINT) AS poly_id,
      |             CAST((n_nationkey*7)%50 + 0.25 AS DOUBLE) AS x0,
      |             CAST((n_nationkey*11)%50 + 0.5 AS DOUBLE) AS y0
      |      FROM nation)""".stripMargin

  /** 5 zone rects derived from region (16×8). */
  private def regionZones(s: SparkSession, d: String): DataFrame =
    region(s, d).select(
      col("r_regionkey").cast("long").as("poly_id"),
      ((col("r_regionkey") * 10).cast("double") + 0.5).as("x0"),
      ((col("r_regionkey") * 9).cast("double") + 0.25).as("y0"))
      .select(col("poly_id"),
        array(col("x0"), col("x0") + 16.0, col("x0") + 16.0, col("x0")).as("xs"),
        array(col("y0"), col("y0"), col("y0") + 8.0, col("y0") + 8.0).as("ys"))

  private val RegionZoneCte =
    """rz AS (SELECT CAST(r_regionkey AS BIGINT) AS poly_id,
      |             CAST(r_regionkey*10 + 0.5 AS DOUBLE) AS x0,
      |             CAST(r_regionkey*9 + 0.25 AS DOUBLE) AS y0
      |      FROM region)""".stripMargin

  private val CellsCte =
    """cells AS (SELECT i AS cell_id, (i // 64) * 1.0 AS cx, (i % 64) * 1.0 AS cy
      |          FROM range(4096) t(i))""".stripMargin

  /** 4 overlapping rect countries (32-sized, quarter offsets). */
  private val CountryRects: Seq[(String, Double, Double, Double, Double)] = Seq(
    ("C1", 0.25, 0.25, 32.0, 32.0),
    ("C2", 24.5, 0.5, 32.0, 16.0),
    ("C3", 0.5, 28.25, 16.0, 32.0),
    ("C4", 28.25, 24.5, 32.0, 32.0))

  private def countryPolys(s: SparkSession): DataFrame =
    s.createDataFrame(CountryRects).toDF("country", "x0", "y0", "w", "h")
      .select(col("country"),
        array(col("x0"), col("x0") + col("w"), col("x0") + col("w"), col("x0")).as("xs"),
        array(col("y0"), col("y0"), col("y0") + col("h"), col("y0") + col("h")).as("ys"))

  private val CountryCte =
    """c(country, x0, y0, w, h) AS (VALUES
      |  ('C1', 0.25, 0.25, 32.0, 32.0), ('C2', 24.5, 0.5, 32.0, 16.0),
      |  ('C3', 0.5, 28.25, 16.0, 32.0), ('C4', 28.25, 24.5, 32.0, 32.0)),
      |cov AS (SELECT cell_id, country,
      |               least(cx + 1.0, CAST(x0 AS DOUBLE) + CAST(w AS DOUBLE)) - greatest(cx, CAST(x0 AS DOUBLE)) AS ovx,
      |               least(cy + 1.0, CAST(y0 AS DOUBLE) + CAST(h AS DOUBLE)) - greatest(cy, CAST(y0 AS DOUBLE)) AS ovy
      |        FROM cells, c)""".stripMargin

  val spatial: Seq[Q] = Seq(
    Q("q_poly_weights",
      (s, d) => SpatialJoin.polyGridWeights(s, srcGrid, nationPolys(s, d))
        .select("poly_id", "cell_id", "weight"),
      Some(s"""WITH $NationPolyCte,
        |$CellsCte,
        |ov AS (SELECT poly_id, cell_id,
        |              least(cx + 1.0, x0 + 4.0) - greatest(cx, x0) AS ovx,
        |              least(cy + 1.0, y0 + 2.0) - greatest(cy, y0) AS ovy
        |       FROM np, cells)
        |SELECT poly_id, cell_id, ovx * ovy AS weight
        |FROM ov WHERE ovx > 0 AND ovy > 0""".stripMargin)),

    Q("q_poly_remap",
      (s, d) => SpatialJoin.remapToPolygons(
        s, emissionsAgg(s, d), srcGrid, regionZones(s, d)),
      Some(s"""$EmiAggCte,
        |$RegionZoneCte,
        |$CellsCte,
        |w AS (SELECT poly_id, cell_id,
        |             (least(cx + 1.0, x0 + 16.0) - greatest(cx, x0)) *
        |             (least(cy + 1.0, y0 + 8.0) - greatest(cy, y0)) AS weight
        |      FROM rz, cells
        |      WHERE least(cx + 1.0, x0 + 16.0) - greatest(cx, x0) > 0
        |        AND least(cy + 1.0, y0 + 8.0) - greatest(cy, y0) > 0)
        |SELECT poly_id, category, substance, sum(value * weight) AS value
        |FROM emi JOIN w USING (cell_id)
        |GROUP BY 1, 2, 3""".stripMargin)),

    Q("q_poly_pairs",
      (s, d) => SpatialJoin.polyPolyWeights(
        nationPolys(s, d), regionZones(s, d), tileSize = 8.0, normalize = "none")
        .select(col("a_id"), col("b_id"), col("area")),
      Some(s"""WITH $NationPolyCte,
        |$RegionZoneCte
        |SELECT np.poly_id AS a_id, rz.poly_id AS b_id,
        |       (least(np.x0 + 4.0, rz.x0 + 16.0) - greatest(np.x0, rz.x0)) *
        |       (least(np.y0 + 2.0, rz.y0 + 8.0) - greatest(np.y0, rz.y0)) AS area
        |FROM np, rz
        |WHERE np.x0 < rz.x0 + 16.0 AND np.x0 + 4.0 > rz.x0
        |  AND np.y0 < rz.y0 + 8.0 AND np.y0 + 2.0 > rz.y0""".stripMargin)),

    Q("q_buffer_weights",
      (s, d) => {
        // horizontal lines on the 1/4 lattice, buffered square-cap w=2
        // (power of two -> every buffer corner and clip vertex dyadic)
        val lines = nation(s, d).select(
          col("n_nationkey").cast("long").as("line_id"),
          ((col("n_nationkey") * 7 % 40).cast("double") + 4.25).as("x0"),
          ((col("n_nationkey") * 11 % 40).cast("double") + 4.25).as("y0"))
          .select(col("line_id"),
            array(col("x0"), col("x0") + 4.0).as("xs"),
            array(col("y0"), col("y0")).as("ys"))
        SpatialJoin.polyGridWeights(
          s, srcGrid, SpatialJoin.bufferLines(lines, 2.0))
          .select("poly_id", "cell_id", "weight")
      },
      Some(s"""WITH ln AS (SELECT CAST(n_nationkey AS BIGINT) AS poly_id,
        |             CAST((n_nationkey*7)%40 + 4.25 AS DOUBLE) AS x0,
        |             CAST((n_nationkey*11)%40 + 4.25 AS DOUBLE) AS y0
        |      FROM nation),
        |$CellsCte,
        |ov AS (SELECT poly_id, cell_id,
        |              least(cx + 1.0, x0 + 6.0) - greatest(cx, x0 - 2.0) AS ovx,
        |              least(cy + 1.0, y0 + 2.0) - greatest(cy, y0 - 2.0) AS ovy
        |       FROM ln, cells)
        |SELECT poly_id, cell_id, ovx * ovy AS weight
        |FROM ov WHERE ovx > 0 AND ovy > 0""".stripMargin)),

    Q("q_gral_cadastre",
      (s, d) => {
        val polys = nation(s, d).select(
          col("n_nationkey").cast("long").as("poly_id"),
          ((col("n_nationkey") * 7 % 50).cast("double") + 0.25).as("x0"),
          // y0 on the 1/4 lattice so no cell CENTER (k+0.5) ever sits
          // exactly on a rect edge (center-rule vs strict-SQL ambiguity)
          ((col("n_nationkey") * 11 % 50).cast("double") + 0.25).as("y0"),
          (col("n_nationkey") + 1).cast("double").as("value"),
          (col("n_nationkey") % 3).cast("int").as("source_group"))
          .select(col("poly_id"),
            array(col("x0"), col("x0") + 4.0, col("x0") + 4.0, col("x0")).as("xs"),
            array(col("y0"), col("y0"), col("y0") + 2.0, col("y0") + 2.0).as("ys"),
            col("value"), col("source_group"))
        graft.sinks.GralExport.cadastreCells(polys, 1.0, 0.0, 0.0)
      },
      Some(s"""WITH np AS (SELECT CAST(n_nationkey AS BIGINT) AS poly_id,
        |             CAST((n_nationkey*7)%50 + 0.25 AS DOUBLE) AS x0,
        |             CAST((n_nationkey*11)%50 + 0.25 AS DOUBLE) AS y0,
        |             CAST(n_nationkey + 1 AS DOUBLE) AS value,
        |             CAST(n_nationkey % 3 AS INT) AS source_group
        |      FROM nation),
        |cells AS (SELECT i // 64 AS kx, i % 64 AS ky FROM range(4096) t(i)),
        |hit AS (SELECT kx, ky, source_group, value
        |        FROM np, cells
        |        WHERE x0 < kx + 0.5 AND kx + 0.5 < x0 + 4.0
        |          AND y0 < ky + 0.5 AND ky + 0.5 < y0 + 2.0)
        |SELECT CAST(kx AS DOUBLE) AS x, CAST(ky AS DOUBLE) AS y, source_group,
        |       sum(value * 1.0 / 8.0) AS emission
        |FROM hit GROUP BY 1, 2, 3""".stripMargin)),

    // per-category EmissionInfo point writer with the building-height
    // rule — string rows render identically in both engines (dyadic
    // coordinates/heights, no exponent-form doubles)
    Q("q_gral_points",
      (s, d) => {
        import graft.sinks.GralExport
        val grid = graft.model.RegularGrid(8, 4, 0.0, 0.0, 5.0, 10.0)
        val pts = nation(s, d).select(col("n_nationkey").cast("long").as("k"))
          .select(
            ((col("k") % 8) * 5 + 2.5).as("x"),
            ((col("k") % 4) * 10 + 2.5).as("y"),
            ((col("k") + 1) * 0.5).as("value"),
            when(col("k") % 2 === 0, "chimneys").otherwise("ground").as("category"),
            (col("k") % 3).cast("int").as("source_group"))
        val bh = s.range(32).select(col("id").as("cell_id"),
          ((col("id") % 3) * 2.0).as("bh"))
        GralExport.pointRowsInfo(s, pts, Seq(
          "chimneys" -> GralExport.EmissionInfo(height = 10.0, speed = 7.0,
            width = 1.25, temperature = 300.0),
          "ground" -> GralExport.EmissionInfo(height = 0.5,
            heightOverBuildings = false)), grid, bh)
      },
      Some("""WITH n AS (SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation),
        |pts AS (SELECT (k%8)*5 + 2.5 AS x, (k%4)*10 + 2.5 AS y,
        |               (k+1)*0.5 AS value,
        |               CASE WHEN k%2=0 THEN 'chimneys' ELSE 'ground' END AS category,
        |               k%3 AS source_group FROM n),
        |bh AS (SELECT i AS cell_id, (i%3)*2.0 AS bh FROM range(32) t(i)),
        |j AS (SELECT p.*, CAST(floor(x/5)*4 + floor(y/10) AS BIGINT) AS cell
        |      FROM pts p),
        |z AS (SELECT j.*,
        |        CAST(CASE WHEN category='chimneys' THEN 10.0 + coalesce(bh.bh, 0)
        |             ELSE 0.5 END AS DOUBLE) AS z,
        |        CAST(CASE WHEN category='chimneys' THEN 7.0 ELSE 5.0 END AS DOUBLE) AS speed,
        |        CAST(CASE WHEN category='chimneys' THEN 1.25 ELSE 0.5 END AS DOUBLE) AS width,
        |        CAST(CASE WHEN category='chimneys' THEN 300.0 ELSE 353.0 END AS DOUBLE) AS temp
        |      FROM j LEFT JOIN bh ON bh.cell_id = j.cell)
        |SELECT concat_ws(',', x, y, z, value, 0, 0, 0, speed, width, temp,
        |                 source_group) AS line
        |FROM z""".stripMargin)),

    Q("q_country_poly_mask",
      (s, _) => SpatialJoin.polygonMask(s, srcGrid, countryPolys(s)),
      Some(s"""WITH $CellsCte,
        |$CountryCte
        |SELECT cell_id, country FROM (
        |  SELECT cell_id, country,
        |         row_number() OVER (PARTITION BY cell_id
        |                            ORDER BY ovx * ovy DESC, country ASC) AS rn
        |  FROM cov WHERE ovx > 0 AND ovy > 0)
        |WHERE rn = 1""".stripMargin)),

    Q("q_country_poly_fractions",
      (s, _) => SpatialJoin.polygonMask(s, srcGrid, countryPolys(s), fractions = true),
      Some(s"""WITH $CellsCte,
        |$CountryCte
        |SELECT cell_id, country, ovx * ovy AS fraction
        |FROM cov WHERE ovx > 0 AND ovy > 0""".stripMargin)),

    // No SQL oracle (driver rows-only check): hexagon×cell clip areas
    // involve 1/√3 corner coordinates — genuinely not plain-SQL. Geometry
    // exactness is covered by HexGridSpec (corner offsets vs the
    // reference pattern, exact dx·dy shoelace area, conservation under
    // remap); this entry runs the full hex remap in the driver contract.
    // Hex remap WITH a full value-level oracle: the convex clip kernel
    // (orientation normalization, 6 half-plane stages, shoelace) is
    // replicated in DuckDB list lambdas over the same Scala-folded
    // corner constants; only the cross-cell rollup sum is FP-order
    // sensitive, absorbed by round(…, 6) on both engines.
    Q("q_hex_remap",
      (s, d) => {
        val hex = graft.model.HexGrid.fromSpacing(-4.0, -4.0, nx = 20, ny = 22,
          spacing = 4.0)
        SpatialJoin.remapAcrossPolygons(s, emissionsAgg(s, d),
          SpatialJoin.gridAsPolygons(s, srcGrid), hex.cells(s), tileSize = 8.0)
          .withColumn("value", round(col("value"), 6))
      },
      Some(s"""$EmiAggCte,
        |$HexRemapOracle""".stripMargin)),

    // Pinned-literal oracle (OraclePins): DuckDB cannot read the
    // FileGDB container, so the verified output is pinned as VALUES literals. Reads the repo-committed byte-level .gdb
    // fixture through the full MapLuftZurich path (catalog -> layers ->
    // Emission_* selection) and rolls up per category × substance —
    // deterministic totals; byte-level correctness is GdbSpec/MapLuftSpec.
    Q("q_mapluft",
      (s, _) => {
        val gdfs = graft.sources.MapLuft.read(
          s, "/root/repo/fixtures/mapluft.gdb",
          convertLinesToPolygons = false)
        gdfs.toSeq.sortBy(_._1).map { case (cat, df) =>
          val subCols = df.columns.filter(
            graft.sources.MapLuft.DefaultSubstances.contains(_))
          subCols.toSeq.map(sub =>
            df.select(lit(cat).as("category"), lit(sub).as("substance"),
              col(sub).cast("double").as("value"))).reduce(_ unionByName _)
        }.reduce(_ unionByName _)
          .groupBy("category", "substance")
          .agg(round(sum("value"), 6).as("total"),
            count(col("value")).as("n_sources"))
      },
      None),

    // Pinned-literal oracle (OraclePins): DuckDB cannot read HDF5, so
    // the verified output is pinned as VALUES literals.
    // Reads the repo-committed byte-level GFED4 fixture through the full
    // pure-JVM HDF5 path (superblock -> group B-trees -> chunked+deflate
    // datasets) and the reference's DM × partitioning × cell-area
    // semantics; byte-level correctness is Hdf5Spec/GfedSpec.
    Q("q_gfed4",
      (s, _) => {
        val inv = graft.sources.GfedLoader.readGfed4(
          s, "/root/repo/fixtures/gfed4.hdf5", "DM")
        inv.annual
          .groupBy("category", "substance")
          .agg(round(sum("value"), 6).as("total"),
            count(col("value")).as("n_cells"))
      },
      None),

    // Same data through the NEW-format HDF5 container (v3 superblock,
    // OHDR v2 headers with verified lookup3 checksums, compact links,
    // v4 layouts incl. a paged fixed-array chunk index) — the subset
    // libver='latest' writers produce. The pinned oracle is q_gfed4's:
    // identical values prove the container encoding is invisible to the
    // loader. Byte-level correctness is Hdf5NewFormatSpec.
    Q("q_gfed4_nf",
      (s, _) => {
        val inv = graft.sources.GfedLoader.readGfed4(
          s, "/root/repo/fixtures/gfed4_nf.hdf5", "DM")
        inv.annual
          .groupBy("category", "substance")
          .agg(round(sum("value"), 6).as("total"),
            count(col("value")).as("n_cells"))
      },
      None),

    // Pinned-literal oracles (OraclePins): DuckDB cannot read the
    // committed NetCDF fixtures, so verified outputs pin as VALUES literals. Each loader query below runs the full
    // byte-level read path (container dispatch -> axis/grid inference ->
    // reference unit/index semantics) over fixtures/; value-level
    // correctness is the loader's ScalaTest spec on identical byte
    // layouts (TnoSpec, GfasSpec, CamsRegSpec, LpjGuessSpec,
    // GlobalRastersSpec).

    // TNO source list (tno.py:30-402): area/point split, 1-based grid
    // indexes, substance-variable merge (co2_ff + co2_bf -> CO2).
    Q("q_tno",
      (s, _) => {
        val inv = graft.sources.TnoLoader.read(s, "/root/repo/fixtures/tno.nc",
          Map("co2_ff" -> "CO2", "co2_bf" -> "CO2", "ch4" -> "CH4"))
        inv.area
          .select(lit("area").as("kind"), col("category"), col("substance"),
            col("value"))
          .unionByName(inv.points
            .select(lit("point").as("kind"), col("category"), col("substance"),
              col("value")))
          .groupBy("kind", "category", "substance")
          .agg(round(sum("value"), 6).as("total"), count(lit(1)).as("n_rows"))
      },
      None),

    // GFAS daily fluxes (gfas.py:25-127): annual mean x SEC_PER_YR x
    // spherical cell area, sparse daily series preserved.
    Q("q_gfas",
      (s, _) => {
        val inv = graft.sources.GfasLoader.read(s, "/root/repo/fixtures/gfas.nc")
        inv.annual
          .select(lit("annual").as("kind"), col("substance"),
            col("value"))
          .unionByName(inv.dailySeries
            .select(lit("daily").as("kind"), col("substance"),
              col("flux").as("value")))
          .groupBy("kind", "substance")
          .agg(round(sum("value"), 6).as("total"), count(lit(1)).as("n_rows"))
      },
      None),

    // Saunois multi-file inventory (saunois.py:24-56): one file per
    // category (stem-named), day-weighted month sum × 1e-3 × spherical
    // area. Per-cell values are bit-deterministic (fixed-order driver
    // loop, no cross-row sums) → pinned exactly; value-level math is
    // GlobalRastersSpec's hand-computed cases.
    Q("q_saunois",
      (s, _) => {
        val inv = graft.sources.GlobalRasters.readSaunois(s, Seq(
          "/root/repo/fixtures/saunois/wetland.nc",
          "/root/repo/fixtures/saunois/rice.nc"))
        val nm = inv.monthly.groupBy("category", "cell_id")
          .agg(count(lit(1)).as("n_months"))
        inv.annual.join(nm, Seq("category", "cell_id"))
          .select(col("category"), col("cell_id"), col("value"), col("n_months"))
      },
      None),

    // WetCHARTs cube (wetcharts.py:35-106): model COORDINATE selection
    // and the NaN-skipping all-model mean, mg m-2 d-1 → kg/y/cell via
    // month mean × area × 1e-6 × 365.25, month-of-year ratio profiles.
    Q("q_wetcharts",
      (s, _) => {
        val path = "/root/repo/fixtures/wetcharts.nc"
        def slice(mode: String, model: Option[Int]) = {
          val inv = graft.sources.GlobalRasters.readWetCharts(s, path, model)
          inv.annual.join(
            inv.monthly.where(col("pos") === 0)
              .select(col("cell_id"), col("ratio").as("ratio0")),
            "cell_id")
            .select(lit(mode).as("mode"), col("cell_id"), col("value"),
              col("ratio0"))
        }
        slice("mean", None).unionByName(slice("m2913", Some(2913)))
      },
      None),

    // CAMS-REG-AQ directory (cams_reg_aq.py:14-146): filename substance
    // capture, per-category variables, Tg -> kg.
    Q("q_cams",
      (s, _) => {
        val (_, inv) = graft.sources.CamsRegLoader.read(
          s, "/root/repo/fixtures/cams",
          categoriesMapping = Map("A_PublicPower" -> "A", "B_Industry" -> "B"))
        inv.groupBy("category", "substance")
          .agg(round(sum("value"), 6).as("total"), count(lit(1)).as("n_cells"))
      },
      None),

    // LPJ-GUESS wetland output (lpjguess.py:13-132): <sub>_<cat> variable
    // split, mg m-2 d-1 -> kg/y, per-day ratio series.
    Q("q_lpj",
      (s, _) => {
        val inv = graft.sources.LpjGuessLoader.read(
          s, Seq("/root/repo/fixtures/lpjguess.nc"), 2023)
        inv.annual
          .select(lit("annual").as("kind"), col("category"), col("substance"),
            col("value"))
          .unionByName(inv.dailyRatios
            .select(lit("ratio").as("kind"), col("category"), col("substance"),
              col("ratio").as("value")))
          .groupBy("kind", "category", "substance")
          .agg(round(sum("value"), 6).as("total"), count(lit(1)).as("n_rows"))
      },
      None),

    // Real-shape country mask (S13): the committed Natural-Earth-style
    // extract (.shp/.dbf with simplified alpine outlines) through the
    // byte-level Shapefile reader into polygonMask, joined to the TNO
    // country_tz table layout — cells per country × timezone offset.
    Q("q_country_real",
      (s, _) => {
        // ring-keeping read: exercises the hole-aware mask path on real
        // shapefile data (identical result while the extract is
        // hole-free — the pinned oracle guards that equivalence)
        val countries = graft.sources.Shapefile.countryPolygonsWithRings(
          s, "/root/repo/fixtures/ne_extract/ne_extract.shp",
          "/root/repo/fixtures/ne_extract/ne_extract.dbf")
        // 0.25° cells over the alpine window of the fixture outlines
        val grid = graft.model.RegularGrid(96, 40, -5.0, 42.0, 0.25, 0.25)
        val mask = SpatialJoin.polygonMask(s, grid, countries)
        val tz = graft.sources.CountryTz.read(
          s, "/root/repo/fixtures/country_tz.csv")
        mask.groupBy("country").agg(count(lit(1)).as("n_cells"))
          .join(tz.select(col("iso3").as("country"), col("tz_hours"),
            col("summertime")), Seq("country"))
      },
      None),

    // OSM Overpass JSON (utils/osm.py:18-179): node/way/relation
    // resolution with ring stitching and outer/inner roles over the
    // committed fixture; value-level correctness is OsmSpec.
    Q("q_osm",
      (s, _) => graft.sources.OsmJson.read(s, "/root/repo/fixtures/osm.json")
        .select(col("id"), col("el_type"), col("name"), col("part"),
          col("role"), col("kind"), size(col("xs")).as("n_vertices"),
          round(element_at(col("xs"), 1), 6).as("x0"),
          round(element_at(col("ys"), 1), 6).as("y0")),
      None),

    // EDGAR auxiliary temporal profiles (edgar/temporal.py:26-171):
    // weekly factors + the hour-of-week-per-month composition with
    // per-country weekend-day routing, over committed CSV fixtures.
    Q("q_edgar_profiles",
      (s, _) => {
        val dir = "/root/repo/fixtures/edgar_profiles"
        val weekly = graft.sources.EdgarProfiles.weeklyProfiles(s, dir)
          .select(lit("weekly").as("kind"), col("country"), col("category"),
            col("dow0").cast("long").as("pos"), col("ratio"))
        val howm = graft.sources.EdgarProfiles
          .hourOfWeekPerMonthProfiles(s, dir)
          .select(lit("howm").as("kind"), col("country"), col("category"),
            col("pos").cast("long").as("pos"), col("ratio"))
        weekly.unionByName(howm)
          .groupBy("kind", "country", "category")
          .agg(count(lit(1)).as("n_pos"),
            round(sum("ratio"), 6).as("ratio_sum"),
            round(max("ratio"), 9).as("ratio_max"))
      },
      None),

    // EDGAR v8 directory (edgar/edgarv8.py:32-137) through the
    // DISTRIBUTED one-task-per-file read — the 100 TB ingestion path.
    Q("q_edgar_dir",
      (s, _) => {
        val (grid, _) = graft.sources.GlobalRasters.readEdgarDir(
          s, "/root/repo/fixtures/edgar")
        graft.sources.GlobalRasters.readEdgarDirDistributed(
          s, "/root/repo/fixtures/edgar", grid)
          .groupBy("category", "substance")
          .agg(round(sum("value"), 6).as("total"), count(lit(1)).as("n_cells"))
      },
      None),

    // The SAME EDGAR aggregate through `spark.read.format("netcdf")` —
    // the DataSource V2 form of the read above (SURVEY §4 item 4): one
    // task per file, variable/file/bbox predicates prune at scan
    // (NetcdfDsv2Spec pins that unselected variables are never
    // decoded). Shares q_edgar_dir's pinned oracle values: identical
    // rows through an independent read path.
    Q("q_edgar_dsv2",
      (s, _) => {
        val (grid, _) = graft.sources.GlobalRasters.readEdgarDir(
          s, "/root/repo/fixtures/edgar")
        graft.sources.GlobalRasters.readEdgarDirV2(
          s, "/root/repo/fixtures/edgar", grid)
          .groupBy("category", "substance")
          .agg(round(sum("value"), 6).as("total"), count(lit(1)).as("n_cells"))
      },
      None),

    // The pushdown path of the same scan, gate-verified: a `file` IN
    // predicate prunes partitions at planning and a `variable`
    // predicate prunes decode inside the parser (NetcdfDsv2Spec pins
    // the mechanics; this pins the VALUES those pruned plans produce —
    // the CH4 half of q_edgar_dsv2's pin).
    Q("q_edgar_dsv2_pushdown",
      (s, _) => {
        val (grid, _) = graft.sources.GlobalRasters.readEdgarDir(
          s, "/root/repo/fixtures/edgar")
        graft.sources.GlobalRasters.readEdgarDirV2(
          s, "/root/repo/fixtures/edgar", grid,
          files = Seq("CH4_ENE.nc", "CH4_TRO.nc"))
          .groupBy("category", "substance")
          .agg(round(sum("value"), 6).as("total"), count(lit(1)).as("n_cells"))
      },
      None),

    // Z-order layout key (M69): the interleaved-bit Morton key over the
    // 64×64 emissions grid, computed by the codegen'd shift/mask ladder
    // in ops.Layout — the oracle replays the SAME ladder in DuckDB
    // BIGINT arithmetic, so every key is bit-identical across engines.
    Q("q_zorder_key",
      (s, d) => {
        import graft.ops.Layout
        emissions(s, d).select(col("cell_id")).distinct()
          .select(col("cell_id"),
            Layout.zorderKey(col("cell_id") / lit(64L) cast "long",
              col("cell_id") % 64).as("z_key"))
      },
      Some(s"""$EmiCte,
        |c AS (SELECT DISTINCT cell_id, cell_id // 64 AS x, cell_id % 64 AS y FROM emissions),
        |s1 AS (SELECT cell_id, (x | (x << 16)) & 281470681808895 AS x, (y | (y << 16)) & 281470681808895 AS y FROM c),
        |s2 AS (SELECT cell_id, (x | (x << 8)) & 71777214294589695 AS x, (y | (y << 8)) & 71777214294589695 AS y FROM s1),
        |s3 AS (SELECT cell_id, (x | (x << 4)) & 1085102592571150095 AS x, (y | (y << 4)) & 1085102592571150095 AS y FROM s2),
        |s4 AS (SELECT cell_id, (x | (x << 2)) & 3689348814741910323 AS x, (y | (y << 2)) & 3689348814741910323 AS y FROM s3),
        |s5 AS (SELECT cell_id, (x | (x << 1)) & 6148914691236517205 AS x, (y | (y << 1)) & 6148914691236517205 AS y FROM s4)
        |SELECT cell_id, x | (y << 1) AS z_key FROM s5""".stripMargin)),

    // Read-side bbox pruning over the z key (M69): the quadtree-derived
    // OR-of-BETWEEN z cover AND the exact box filter must equal the plain
    // box query — the oracle runs only the box predicate, so a hash match
    // proves the capped cover is lossless (a superset, never a subset).
    // The box is deliberately lattice-UNaligned so the decomposition
    // exercises every recursion arm, and maxRanges=12 forces the
    // gap-swallowing cap path too.
    Q("q_zorder_box_prune",
      (s, d) => {
        import graft.ops.Layout
        val ranges = Layout.zRangesForBox(13, 47, 9, 52, bits = 6,
          maxRanges = 12)
        val ix = col("cell_id") / lit(64L) cast "long"
        val iy = col("cell_id") % 64
        emissions(s, d)
          .withColumn("z_key", Layout.zorderKey(ix, iy))
          .where(Layout.inZRanges(col("z_key"), ranges))
          .where(ix.between(13, 47) && iy.between(9, 52))
          .groupBy("substance")
          .agg(sum("value").as("total"),
            countDistinct("cell_id").as("n_cells"))
      },
      Some(s"""$EmiCte
        |SELECT substance, sum(value) AS total, count(DISTINCT cell_id) AS n_cells
        |FROM emissions
        |WHERE cell_id // 64 BETWEEN 13 AND 47 AND cell_id % 64 BETWEEN 9 AND 52
        |GROUP BY 1""".stripMargin)),

    // Z-order table DELETE lifecycle (M69, r18): write → append →
    // tombstone (merge-on-read, visible immediately through the
    // box-pruned read) → consolidate (applied physically, tombstones
    // retired) → read. The oracle is the plain box aggregate over the
    // base rows WITHOUT the deleted cells, so a hash match proves both
    // the masked read and the post-consolidate physical state return
    // exactly rebuild-without-deleted.
    Q("q_zorder_delete",
      (s, d) => {
        import graft.ops.Layout
        val dir = TempDirs.create("zdel")
        val ix = col("cell_id") / lit(64L) cast "long"
        val iy = col("cell_id") % 64
        val base = emissions(s, d)
        BuildPhase.timed {
          Layout.zorderWrite(
            base.where(col("cell_id") < 2048), ix, iy, 4, dir)
          Layout.zorderAppend(base.where(col("cell_id") >= 2048), ix, iy, dir)
          Layout.zorderDelete(s, dir, "cell_id",
            base.where(col("cell_id") % 9 === 4).select("cell_id").distinct())
          Layout.zorderConsolidate(s, dir, 2)
        }
        val ranges = Layout.zRangesForBox(13, 47, 9, 52, bits = 6,
          maxRanges = 12)
        val rix = col("cell_id") / lit(64L) cast "long"
        val riy = col("cell_id") % 64
        Layout.zorderTable(s, dir)
          .where(Layout.inZRanges(col("z_key"), ranges))
          .where(rix.between(13, 47) && riy.between(9, 52))
          .groupBy("substance")
          .agg(sum("value").as("total"),
            countDistinct("cell_id").as("n_cells"))
      },
      Some(s"""$EmiCte
        |SELECT substance, sum(value) AS total, count(DISTINCT cell_id) AS n_cells
        |FROM emissions
        |WHERE cell_id // 64 BETWEEN 13 AND 47 AND cell_id % 64 BETWEEN 9 AND 52
        |  AND cell_id % 9 <> 4
        |GROUP BY 1""".stripMargin)),

    // Bloom-filter point-lookup layout (M72): documents hash-clustered
    // by content hash and written with a parquet bloom filter on the
    // key, then point-looked-up by the keys of three probe docs through
    // the real write→scan path (pushdown IN consults the blooms during
    // row-group selection — LayoutSpec pins the ~37× scan reduction;
    // this gate pins that the pruned scan returns exactly the rows the
    // plain predicate does, including hash-collision duplicates).
    Q("q_bloom_lookup",
      (s, d) => {
        import graft.ops.Layout
        val keyed = documents(s, d).select(col("doc_id"),
          graft.functions.PortableHashExpr.portableHash(col("text")).as("k"))
        // session-scoped path + overwrite: repeated runs in one session
        // reuse the directory instead of accumulating tempdirs, while
        // the app-id discriminator keeps two concurrent sessions on one
        // box from clobbering each other's fixture mid-read
        val path = s"${System.getProperty("java.io.tmpdir")}/" +
          s"graft_bloom_gate_${s.sparkContext.applicationId}"
        var w = Layout.bloomLayout(keyed, "k", numFiles = 4)
          .write.mode("overwrite")
        Layout.bloomWriteOptions("k", expectedNdv = 1000L)
          .foreach { case (o, v) => w = w.option(o, v) }
        w.parquet(path)
        val probe = keyed.where(col("doc_id").isin(7L, 77L, 177L))
          .select("k").collect().map(_.getLong(0)).toSeq
        Layout.pointLookup(s, path, "k", probe).select("doc_id", "k")
      },
      Some(s"""WITH h AS (SELECT doc_id, ${QueriesML.hashSqlOf("text")} AS k
        |           FROM documents)
        |SELECT doc_id, k FROM h
        |WHERE k IN (SELECT k FROM h WHERE doc_id IN (7, 77, 177))""".stripMargin))
  )
}
