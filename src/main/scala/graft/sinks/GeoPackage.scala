package graft.sinks

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.RegularGrid
import graft.sinks.Sqlite._

/** REAL GeoPackage export/import (reference `export_to_geopackage`,
  * emiproc/exports/geopackage.py:9-60) — an actual OGC GeoPackage: an
  * SQLite database (via the dependency-free [[Sqlite]] writer) holding
  * `gpkg_spatial_ref_sys` / `gpkg_contents` / `gpkg_geometry_columns`
  * plus one feature table per layer, geometries encoded as GeoPackage
  * Binary (GPB header + WKB through the byte-level [[graft.sources.Wkb]]
  * codec). Any `sqlite3`/OGC reader opens the result (SqliteSpec /
  * GeoPackageSpec prove it with python's stdlib sqlite3 engine:
  * integrity_check ok, content readable by SQL).
  *
  * Reference semantics preserved (geopackage.py:40-60):
  *  - each shaped-emissions category becomes its own layer, named by
  *    the category;
  *  - the gridded inventory becomes layer `name_gridded`
  *    ("gridded_emissions"), its long (cell, category, substance, value)
  *    form pivoted to the reference's wide tuple columns joined with
  *    "_" (`"_".join(col)` — geopackage.py:56-58);
  *  - a category named like the gridded layer raises (geopackage.py:49-53).
  *
  * Scale: a GeoPackage is a single SQLite file — an inherently
  * driver-side sink, like the NetCDF exports (K1/K6). Rows stream
  * through `toLocalIterator` in fid order (no full Spark collect);
  * driver memory is O(output file), never O(job). The 100 TB path keeps
  * aggregates distributed and exports only final (typically
  * grid-×-substance-sized) layers.
  */
object GeoPackage {

  /** GeoPackage Binary header + WKB: magic "GP", version 0, flags
    * 0x03 = little-endian + XY envelope, srs_id, envelope
    * (minx, maxx, miny, maxy). */
  def gpbEncode(wkb: Array[Byte], srsId: Int): Array[Byte] = {
    val g = graft.sources.Wkb.decode(wkb)
    val xs = g.parts.iterator.flatMap(_.xs)
    val ys = g.parts.iterator.flatMap(_.ys)
    var (x0, x1) = (Double.MaxValue, Double.MinValue)
    xs.foreach { x => if (x < x0) x0 = x; if (x > x1) x1 = x }
    var (y0, y1) = (Double.MaxValue, Double.MinValue)
    ys.foreach { y => if (y < y0) y0 = y; if (y > y1) y1 = y }
    val bb = java.nio.ByteBuffer.allocate(8 + 32 + wkb.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('G'.toByte).put('P'.toByte).put(0.toByte).put(3.toByte)
    bb.putInt(srsId)
    bb.putDouble(x0).putDouble(x1).putDouble(y0).putDouble(y1)
    bb.put(wkb)
    bb.array()
  }

  /** Strip the GPB header back to plain WKB. */
  def gpbDecode(gpb: Array[Byte]): Array[Byte] = {
    require(gpb.length > 8 && gpb(0) == 'G'.toByte && gpb(1) == 'P'.toByte,
      "not a GeoPackage Binary geometry")
    val flags = gpb(3) & 0xff
    val envLen = ((flags >> 1) & 0x7) match {
      case 0 => 0
      case 1 => 32
      case 2 | 3 => 48
      case 4 => 64
      case other => throw new IllegalArgumentException(s"bad GPB envelope $other")
    }
    java.util.Arrays.copyOfRange(gpb, 8 + envLen, gpb.length)
  }

  /** GPB envelope (minx, maxx, miny, maxy) without decoding the WKB. */
  def gpbEnvelope(gpb: Array[Byte]): (Double, Double, Double, Double) = {
    require((gpb(3) & 0xff & 0xe) >> 1 == 1, "GPB without XY envelope")
    val bb = java.nio.ByteBuffer.wrap(gpb, 8, 32)
      .order(if ((gpb(3) & 1) == 1) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN)
    (bb.getDouble, bb.getDouble, bb.getDouble, bb.getDouble)
  }

  // ---- metadata tables (DDL per OGC GeoPackage spec; the PRIMARY KEY /
  // UNIQUE constraints and their sqlite_autoindex_* entries must agree or
  // sqlite rejects the schema as malformed — SqliteSpec proves agreement)

  private val SrsDdl =
    "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, " +
      "srs_id INTEGER NOT NULL PRIMARY KEY, organization TEXT NOT NULL, " +
      "organization_coordsys_id INTEGER NOT NULL, definition TEXT NOT NULL, " +
      "description TEXT)"

  private val ContentsDdl =
    "CREATE TABLE gpkg_contents (table_name TEXT NOT NULL PRIMARY KEY, " +
      "data_type TEXT NOT NULL, identifier TEXT UNIQUE, " +
      "description TEXT DEFAULT '', last_change DATETIME NOT NULL, " +
      "min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, " +
      "srs_id INTEGER, CONSTRAINT fk_gc_r_srs_id FOREIGN KEY (srs_id) " +
      "REFERENCES gpkg_spatial_ref_sys(srs_id))"

  private val GeomColsDdl =
    "CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, " +
      "column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL, " +
      "srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m TINYINT NOT NULL, " +
      "CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name), " +
      "CONSTRAINT fk_gc_tn FOREIGN KEY (table_name) REFERENCES " +
      "gpkg_contents(table_name), CONSTRAINT fk_gc_srs FOREIGN KEY (srs_id) " +
      "REFERENCES gpkg_spatial_ref_sys(srs_id))"

  private val Wgs84Wkt =
    "GEOGCS[\"WGS 84\",DATUM[\"WGS_1984\",SPHEROID[\"WGS 84\"," +
      "6378137,298.257223563]],PRIMEM[\"Greenwich\",0]," +
      "UNIT[\"degree\",0.0174532925199433],AUTHORITY[\"EPSG\",\"4326\"]]"

  /** One feature layer ready to write: geometry already GPB-encoded. */
  final case class LayerRows(
      name: String,
      geometryType: String,
      attrSchema: Seq[(String, String)], // (column, sqlite type) after geom
      rows: Iterator[(Long, Array[Byte], Seq[V])]) // (fid, gpb, attrs)

  /** Assemble and write the .gpkg file. Deterministic for fixed inputs
    * (`lastChange` defaults to a constant, not now()). */
  def write(
      path: String,
      layers: Seq[LayerRows],
      srsId: Int = 4326,
      srsDef: Option[(String, String)] = None, // (name, definition WKT)
      lastChange: String = "2026-01-01T00:00:00.000Z",
      pageSize: Int = 4096): Unit = {
    require(layers.map(_.name).distinct.size == layers.size, "duplicate layer names")
    val srsRows: Seq[(Long, Seq[V])] = {
      val base = Seq(
        (-1L, Seq[V](VText("Undefined cartesian SRS"), VInt(-1), VText("NONE"),
          VInt(-1), VText("undefined"), VText("undefined cartesian coordinate reference system"))),
        (0L, Seq[V](VText("Undefined geographic SRS"), VInt(0), VText("NONE"),
          VInt(0), VText("undefined"), VText("undefined geographic coordinate reference system"))))
      val used =
        if (srsId == 4326 && srsDef.isEmpty)
          Seq((4326L, Seq[V](VText("WGS 84 geodetic"), VInt(4326), VText("EPSG"),
            VInt(4326), VText(Wgs84Wkt), VText("longitude/latitude coordinates in decimal degrees"))))
        else {
          val (n, d) = srsDef.getOrElse((s"SRS $srsId", "undefined"))
          Seq((srsId.toLong, Seq[V](VText(n), VInt(srsId), VText("EPSG"),
            VInt(srsId), VText(d), VNull)))
        }
      base ++ used
    }
    val srsTable = TableDef("gpkg_spatial_ref_sys", SrsDdl, rowidAlias = 1)

    // feature tables stream first (they compute their envelopes while
    // paging), then the metadata tables reference the results
    val featureTables = new scala.collection.mutable.ArrayBuffer[(TableDef, Seq[(Long, Seq[V])])]()
    val contentRows = new scala.collection.mutable.ArrayBuffer[(Long, Seq[V])]()
    val geomColRows = new scala.collection.mutable.ArrayBuffer[(Long, Seq[V])]()
    layers.zipWithIndex.foreach { case (layer, li) =>
      val cols = (Seq("fid" -> "INTEGER PRIMARY KEY", "geom" -> layer.geometryType) ++
        layer.attrSchema).map { case (n, t) => s""""$n" $t""" }
      val ddl = s"""CREATE TABLE "${layer.name}" (${cols.mkString(", ")})"""
      var (ex0, ex1, ey0, ey1) = (Double.MaxValue, Double.MinValue, Double.MaxValue, Double.MinValue)
      val data = layer.rows.map { case (fid, gpb, attrs) =>
        val (x0, x1, y0, y1) = gpbEnvelope(gpb)
        if (x0 < ex0) ex0 = x0; if (x1 > ex1) ex1 = x1
        if (y0 < ey0) ey0 = y0; if (y1 > ey1) ey1 = y1
        (fid, VInt(fid) +: VBlob(gpb) +: attrs)
      }.toSeq
      require(data.nonEmpty, s"layer ${layer.name}: no features")
      featureTables += ((TableDef(layer.name, ddl, rowidAlias = 0), data))
      contentRows += ((li + 1L, Seq[V](VText(layer.name), VText("features"),
        VText(layer.name), VText(""), VText(lastChange),
        VReal(ex0), VReal(ey0), VReal(ex1), VReal(ey1), VInt(srsId))))
      geomColRows += ((li + 1L, Seq[V](VText(layer.name), VText("geom"),
        VText(layer.geometryType), VInt(srsId), VInt(0), VInt(0))))
    }

    val contentsTable = TableDef("gpkg_contents", ContentsDdl,
      indexes = Seq(
        IndexDef("sqlite_autoindex_gpkg_contents_1", Seq(0)),
        IndexDef("sqlite_autoindex_gpkg_contents_2", Seq(2))))
    val geomColsTable = TableDef("gpkg_geometry_columns", GeomColsDdl,
      indexes = Seq(IndexDef("sqlite_autoindex_gpkg_geometry_columns_1", Seq(0, 1))))

    val bytes = Sqlite.build(
      Seq(srsTable -> srsRows, contentsTable -> contentRows.toSeq,
        geomColsTable -> geomColRows.toSeq) ++ featureTables,
      pageSize = pageSize,
      applicationId = 0x47504B47, // "GPKG"
      userVersion = 10300) // GeoPackage 1.3
    Sqlite.writeFile(path, bytes)
  }

  // ---- Spark-facing export with the reference's layer semantics

  private def sqliteType(dt: DataType): String = dt match {
    case LongType | IntegerType | ShortType | ByteType | BooleanType => "INTEGER"
    case DoubleType | FloatType => "DOUBLE"
    case StringType => "TEXT"
    case BinaryType => "BLOB"
    case other => throw new IllegalArgumentException(s"unsupported gpkg type $other")
  }

  private def toV(v: Any): V = v match {
    case null => VNull
    case x: Long => VInt(x)
    case x: Int => VInt(x)
    case x: Short => VInt(x)
    case x: Byte => VInt(x)
    case x: Boolean => VInt(if (x) 1 else 0)
    case x: Double => VReal(x)
    case x: Float => VReal(x)
    case x: String => VText(x)
    case x: Array[Byte] => VBlob(x)
    case other => throw new IllegalArgumentException(s"unsupported gpkg value $other")
  }

  /** One DataFrame → LayerRows: needs `fid` (integral), `geom` (WKB
    * binary); every other column becomes an attribute. Rows stream in
    * fid order via toLocalIterator (no full collect). */
  def layerOf(name: String, df: DataFrame, geometryType: String,
      srsId: Int): LayerRows = {
    val fields = df.schema.fields
    require(fields.exists(_.name == "fid") && fields.exists(_.name == "geom"),
      s"layer $name needs fid and geom columns, got ${fields.map(_.name).mkString(",")}")
    val attrs = fields.filterNot(f => f.name == "fid" || f.name == "geom")
    val ordered = df.select((col("fid") +: col("geom") +: attrs.map(f => col(f.name))
      .toIndexedSeq): _*).orderBy("fid")
    val it = ordered.toLocalIterator()
    val rows = new Iterator[(Long, Array[Byte], Seq[V])] {
      def hasNext: Boolean = it.hasNext
      def next(): (Long, Array[Byte], Seq[V]) = {
        val r = it.next()
        val fid = r.get(0) match {
          case l: Long => l
          case i: Int => i.toLong
          case other => throw new IllegalArgumentException(s"bad fid $other")
        }
        val gpb = gpbEncode(r.getAs[Array[Byte]](1), srsId)
        (fid, gpb, (2 until r.length).map(i => toV(r.get(i))))
      }
    }
    LayerRows(name, geometryType, attrs.map(f => f.name -> sqliteType(f.dataType)).toSeq, rows)
  }

  /** The reference's gridded layer: long (cell_id, category, substance,
    * value) pivoted to wide `category_substance` columns
    * (geopackage.py:56-58's `"_".join(col)`), cell polygons as geometry,
    * `fid = cell_id + 1`. The pivot is one shuffle; the cell-polygon WKB
    * is a narrow per-row kernel. */
  def griddedLayer(
      spark: SparkSession,
      emissions: DataFrame,
      grid: RegularGrid,
      srsId: Int = 4326): DataFrame = {
    val wide = emissions
      .withColumn("cat_sub", concat(col("category"), lit("_"), col("substance")))
      .groupBy("cell_id").pivot("cat_sub").agg(sum("value"))
    val polyUdf = udf((x0: Double, y0: Double, x1: Double, y1: Double) =>
      graft.sources.Wkb.encodePolygon(Seq((
        Array(x0, x1, x1, x0, x0), Array(y0, y0, y1, y1, y0)))))
    wide
      .withColumn("fid", col("cell_id") + 1)
      .withColumn("geom", polyUdf(
        grid.cellXmin(col("cell_id")), grid.cellYmin(col("cell_id")),
        grid.cellXmax(col("cell_id")), grid.cellYmax(col("cell_id"))))
      .drop("cell_id")
  }

  /** Reference `export_to_geopackage` (geopackage.py:9-60): one layer per
    * shaped-emissions category plus the gridded layer; collision between
    * a category name and `nameGridded` raises, as in the reference. */
  def exportToGeopackage(
      spark: SparkSession,
      path: String,
      gdfs: Map[String, DataFrame], // category -> (fid, geom WKB, attrs…)
      gridded: Option[DataFrame], // already-wide gridded layer (griddedLayer)
      nameGridded: String = "gridded_emissions",
      geometryTypes: Map[String, String] = Map.empty,
      srsId: Int = 4326,
      lastChange: String = "2026-01-01T00:00:00.000Z",
      pageSize: Int = 4096): Unit = {
    require(gridded.isEmpty || !gdfs.contains(nameGridded),
      s"Category name '$nameGridded' already exists in inventory categories.")
    val catLayers = gdfs.toSeq.sortBy(_._1).map { case (cat, df) =>
      layerOf(cat, df, geometryTypes.getOrElse(cat, "GEOMETRY"), srsId)
    }
    val gridLayer = gridded.map(df =>
      layerOf(nameGridded, df, "POLYGON", srsId)).toSeq
    write(path, catLayers ++ gridLayer, srsId = srsId, lastChange = lastChange,
      pageSize = pageSize)
  }

  // ---- reader (for round-trip verification and as a small-dims source)

  /** Parse our feature-table DDL back to (name, type) pairs. */
  private def ddlColumns(sql: String): Seq[(String, String)] = {
    val body = sql.substring(sql.indexOf('(') + 1, sql.lastIndexOf(')'))
    // split top-level commas (our DDL nests no parens inside column defs)
    body.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
      .filterNot(_.toUpperCase.startsWith("CONSTRAINT"))
      .map { colDef =>
        val (name, rest) =
          if (colDef.startsWith("\"")) {
            val e = colDef.indexOf('"', 1)
            (colDef.substring(1, e), colDef.substring(e + 1).trim)
          } else {
            val sp = colDef.indexOf(' ')
            (colDef.substring(0, sp), colDef.substring(sp + 1).trim)
          }
        (name, rest.split("\\s+").head.toUpperCase)
      }
  }

  final case class GpkgLayer(
      name: String, geometryType: String, srsId: Int, df: DataFrame)

  /** Read every feature layer of a .gpkg back as DataFrames: `fid`,
    * `geom` (plain WKB, GPB stripped), then the attribute columns.
    * Driver-side read of a single file (the sink's inverse), then
    * parallelized — a small-dims source, like the NetCDF loaders. */
  def readGeopackage(spark: SparkSession, path: String): Seq[GpkgLayer] = {
    val db = Sqlite.openFile(path)
    val layers = db.scan(db.tableRoot("gpkg_geometry_columns")).map { case (_, v) =>
      (v(0).asInstanceOf[VText].v, v(2).asInstanceOf[VText].v,
        v(3).asInstanceOf[VInt].v.toInt)
    }
    layers.map { case (name, geomType, srsId) =>
      val sql = db.master.collectFirst {
        case ("table", `name`, _, _, Some(s)) => s
      }.getOrElse(throw new NoSuchElementException(s"no DDL for layer $name"))
      val cols = ddlColumns(sql)
      val schema = StructType(cols.map { case (n, t) =>
        val dt = t match {
          case "INTEGER" => LongType
          case "DOUBLE" | "REAL" | "FLOAT" => DoubleType
          case "TEXT" | "DATETIME" => StringType
          case _ => BinaryType // BLOB and geometry type names
        }
        StructField(n, dt, nullable = true)
      })
      val rows = db.scan(db.tableRoot(name)).map { case (rowid, vals) =>
        val cells = vals.zip(schema.fields).zipWithIndex.map { case ((v, f), i) =>
          (v, f.dataType) match {
            case (VNull, LongType) if i == 0 => rowid // fid = rowid alias
            case (VNull, _) => null
            case (VInt(x), LongType) => x
            case (VInt(x), DoubleType) => x.toDouble
            case (VReal(x), DoubleType) => x
            case (VText(s), StringType) => s
            case (VBlob(b), BinaryType) if f.name == "geom" => gpbDecode(b)
            case (VBlob(b), BinaryType) => b
            case (v, t) => throw new IllegalArgumentException(s"$name.${f.name}: $v as $t")
          }
        }
        Row.fromSeq(cells)
      }
      import scala.jdk.CollectionConverters._
      GpkgLayer(name, geomType, srsId,
        spark.createDataFrame(rows.asJava, schema))
    }
  }
}
