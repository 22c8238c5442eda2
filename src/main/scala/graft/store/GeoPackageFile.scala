package graft.store

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.geo.Wkb
import graft.graph.PropertyGraph

/** Real single-file GeoPackage (SQLite) export/import of a property graph —
  * the reference's actual persistence artifact
  * (`geopackage/__init__.py:90-192`, `geopackagenetwork/__init__.py:9-85`):
  * the standard metadata table set (`gpkg_contents`, `gpkg_extensions`,
  * `gpkg_geometry_columns`, `gpkg_ogr_contents`, `gpkg_spatial_ref_sys`)
  * plus `edges` (LINESTRING) / `nodes` (POINT) feature tables with
  * `fid INTEGER PRIMARY KEY` rowid aliasing and GP-header WKB geometry
  * blobs, written byte-level via [[SqliteFile]].
  *
  * Scale boundary, by design: a `.gpkg` is a single SQLite file — an
  * exchange artifact for GIS tools, not a cluster store (the cluster store
  * is [[GraphPackage]]'s parquet layout). Export therefore streams the
  * graph through the driver via `toLocalIterator` (one partition in memory
  * at a time, never a full collect); it is the same single-node funnel any
  * single-file format forces, including on the reference.
  *
  * Documented DDL divergence: the spec's UNIQUE / composite-PRIMARY-KEY
  * clauses on the metadata tables are omitted because each would require an
  * automatic index b-tree ([[SqliteFile]] writes table b-trees only);
  * uniqueness is guaranteed by the writer, and readers consume table
  * content, not constraints. INTEGER PRIMARY KEYs (rowid aliases: `fid`,
  * `srs_id`) are kept — they need no index.
  */
object GeoPackageFile {

  val ApplicationId = 1196444487 // "GPKG" (geopackage/__init__.py:9)
  val UserVersion = 10200        // (geopackage/__init__.py:10)

  private val Wgs84Wkt =
    """GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563,AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],UNIT["degree",0.0174532925199433,AUTHORITY["EPSG","9122"]],AUTHORITY["EPSG","4326"]]"""

  // =============================== export ================================

  def export(g: PropertyGraph, path: String, srid: Int = Wkb.Srid4326): Unit = {
    // export takes four actions over each frame (count + ordered stream;
    // fid derivation may add more): pin both so the upstream build DAG
    // computes once, not per action
    val edges = prepare(g.edges).persist()
    val nodes = prepare(g.nodes).persist()
    try exportPinned(edges, nodes, path, srid)
    finally { edges.unpersist(blocking = false); nodes.unpersist(blocking = false) }
  }

  private def exportPinned(edges: DataFrame, nodes: DataFrame,
      path: String, srid: Int): Unit = {
    val edgeAttrs = attrColumns(edges)
    val nodeAttrs = attrColumns(nodes)
    val nEdges = edges.count()
    val nNodes = nodes.count()
    val now = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())

    val tables = Seq(
      SqliteFile.TableDef("gpkg_contents",
        """CREATE TABLE gpkg_contents (table_name TEXT, data_type TEXT NOT NULL, identifier TEXT, description TEXT DEFAULT '', last_change TIMESTAMP DEFAULT CURRENT_TIMESTAMP, min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)""",
        10,
        Iterator(
          Seq[Any]("edges", "features", "edges", "", now, null, null, null, null, srid.toLong),
          Seq[Any]("nodes", "features", "nodes", "", now, null, null, null, null, srid.toLong))),
      SqliteFile.TableDef("gpkg_extensions",
        """CREATE TABLE gpkg_extensions (table_name TEXT, column_name TEXT, extension_name TEXT NOT NULL, definition TEXT NOT NULL, scope TEXT NOT NULL)""",
        5, Iterator.empty),
      SqliteFile.TableDef("gpkg_geometry_columns",
        """CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m TINYINT NOT NULL)""",
        6,
        Iterator(
          Seq[Any]("edges", "geom", "LINESTRING", srid.toLong, 0L, 0L),
          Seq[Any]("nodes", "geom", "POINT", srid.toLong, 0L, 0L))),
      SqliteFile.TableDef("gpkg_ogr_contents",
        """CREATE TABLE gpkg_ogr_contents (table_name TEXT NOT NULL, feature_count INTEGER DEFAULT NULL)""",
        2,
        Iterator(Seq[Any]("edges", nEdges), Seq[Any]("nodes", nNodes))),
      SqliteFile.TableDef("gpkg_spatial_ref_sys",
        """CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, srs_id INTEGER NOT NULL, organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL, definition TEXT NOT NULL, description TEXT, PRIMARY KEY (srs_id))""",
        6,
        Iterator(
          Seq[Any]("Undefined cartesian SRS", -1L, "NONE", -1L, "undefined", null),
          Seq[Any]("Undefined geographic SRS", 0L, "NONE", 0L, "undefined", null),
          Seq[Any]("WGS 84 geodetic", 4326L, "EPSG", 4326L, Wgs84Wkt, null))),
      featureTableDef("edges", edges, edgeAttrs, isLine = true, srid),
      featureTableDef("nodes", nodes, nodeAttrs, isLine = false, srid)
    )
    SqliteFile.write(path, tables, ApplicationId, UserVersion)
  }

  /** Internal physical columns never leave the cluster store. */
  private def prepare(df: DataFrame): DataFrame = {
    val internal = Seq(graft.spatial.Spatial.BBoxCol, graft.spatial.Spatial.CellCol)
      .filter(df.columns.contains)
    df.drop(internal: _*)
  }

  private def attrColumns(df: DataFrame): Seq[StructField] =
    df.schema.fields.toSeq.filterNot(f => f.name == "fid" || f.name == "geom")

  private def declType(dt: DataType): String = dt match {
    case StringType => "TEXT"
    case LongType | IntegerType | ShortType | ByteType | BooleanType => "INTEGER"
    case DoubleType | FloatType => "DOUBLE"
    case BinaryType => "BLOB"
    case _ => "TEXT" // struct/array attrs round-trip as their JSON text
  }

  private def featureTableDef(name: String, df: DataFrame,
      attrs: Seq[StructField], isLine: Boolean, srid: Int): SqliteFile.TableDef = {
    val cols = (Seq(""""fid" INTEGER""", """"geom" TEXT""") ++
      attrs.map(f => s""""${f.name}" ${declType(f.dataType)}""")) :+ """PRIMARY KEY ("fid")"""
    val sql = s"""CREATE TABLE "$name" (${cols.mkString(", ")})"""
    // deterministic fids: keep stored ones, else dense row_number in key
    // order. The global window is deliberate: a .gpkg is ONE SQLite file
    // written through one writer anyway (the scale tier is the parquet
    // PropertyGraph; GeoPackage export is the interchange artifact), so
    // the single-task sort is bounded by what fits in a file, not by the
    // cluster's data.
    val keyed =
      if (df.columns.contains("fid")) df.withColumn("fid", col("fid").cast("long"))
      else {
        val keyCols: Seq[org.apache.spark.sql.Column] =
          if (isLine) Seq(col("_u"), col("_v")) else Seq(col("_n"))
        df.withColumn("fid", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(keyCols: _*)).cast("long"))
      }
    val ordered = keyed
      .select((Seq(col("fid"), col("geom.coordinates").as("__coords")) ++
        attrs.map(f => col(f.name))): _*)
      .orderBy("fid")
    import scala.jdk.CollectionConverters._
    val rowsIter = () => ordered.toLocalIterator().asScala.map { r =>
      val fid = r.getLong(0)
      val gp: Any =
        if (r.isNullAt(1)) null
        else if (isLine) Wkb.encodeGpkg(Wkb.encodeLineString(
          r.getSeq[scala.collection.Seq[Double]](1).map(_.toSeq)), srid)
        else Wkb.encodeGpkg(Wkb.encodePoint(r.getSeq[Double](1)), srid)
      Seq[Any](fid, gp) ++ attrs.indices.map(i => sqliteValue(r.get(i + 2)))
    }
    SqliteFile.TableDef(name, sql, 2 + attrs.length, rowsIter())
  }

  private def sqliteValue(v: Any): Any = v match {
    case null => null
    case s: String => s
    case l: Long => l
    case i: Int => i.toLong
    case sh: Short => sh.toLong
    case b: Byte => b.toLong
    case b: Boolean => if (b) 1L else 0L
    case d: Double => d
    case f: Float => f.toDouble
    case a: Array[Byte] => a
    case d: java.math.BigDecimal => d.doubleValue()
    case other => other.toString
  }

  // =============================== import ================================

  /** Load a .gpkg written by this exporter or by the reference: feature
    * tables are discovered through `gpkg_geometry_columns`, GP blobs decode
    * back to the columnar geom struct, and the INTEGER PRIMARY KEY comes
    * back as `fid`.
    */
  def importGraph(spark: SparkSession, path: String): PropertyGraph = {
    val db = SqliteFile.read(path)
    require(db.applicationId == ApplicationId,
      f"$path: application_id 0x${db.applicationId}%08x is not GPKG")
    val geomCols: Map[String, String] = db.tables.get("gpkg_geometry_columns")
      .map(_.rows.map(r => r(0).asInstanceOf[String] -> r(1).asInstanceOf[String]).toMap)
      .getOrElse(Map("edges" -> "geom", "nodes" -> "geom"))

    def frame(table: String, lineGeom: Boolean): Option[DataFrame] =
      db.tables.get(table).map { t =>
        val geomCol = geomCols.getOrElse(table, "geom")
        val coordType: DataType =
          if (lineGeom) ArrayType(ArrayType(DoubleType)) else ArrayType(DoubleType)
        val geomType = StructType(Seq(
          StructField("type", StringType),
          StructField("coordinates", coordType)))
        val fields = t.columns.map { c =>
          if (c.name == geomCol) StructField("geom", geomType)
          else StructField(c.name, c.declType match {
            case dt if dt.contains("INT") => LongType
            case "DOUBLE" | "REAL" | "FLOAT" => DoubleType
            case "BLOB" => BinaryType
            case _ => StringType
          })
        }
        val gi = t.columns.indexWhere(_.name == geomCol)
        val rows: Seq[Row] = t.rows.map { r =>
          val vals = r.toSeq.zipWithIndex.map { case (v, i) =>
            if (i == gi) v match {
              case blob: Array[Byte] =>
                val (_, wkb) = Wkb.decodeGpkg(blob)
                val (geomTypeId, coords) = Wkb.decode(wkb)
                if (lineGeom) {
                  require(geomTypeId == 2, s"$table.$geomCol: expected LineString")
                  Row("LineString", coords)
                } else Row("Point", coords.head)
              case null => null
              case other => throw new IllegalArgumentException(
                s"$table.$geomCol: expected GP blob, got ${other.getClass}")
            } else v
          }
          Row(vals: _*)
        }
        import scala.jdk.CollectionConverters._
        spark.createDataFrame(rows.asJava, StructType(fields))
      }

    val edges = frame("edges", lineGeom = true).getOrElse(
      throw new IllegalArgumentException(s"$path: no edges table"))
    val nodes = frame("nodes", lineGeom = false)
      .getOrElse(graft.ingest.GeoJsonIngest.deriveNodes(edges))
    new PropertyGraph(nodes, edges)
  }
}
