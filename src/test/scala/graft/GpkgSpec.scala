package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.PropertyGraph
import graft.store.{GeoPackageFile, SqliteFile}

/** Real .gpkg (SQLite) interop: byte-level writer/reader round trips, the
  * GeoPackage header contract, and a cross-engine check against a real
  * SQLite implementation (python3's stdlib sqlite3) when one is present.
  * Reference behavior: `geopackage/__init__.py:90-192` (table set, pragmas),
  * `feature_table.py:91-99` (feature DDL), `test_digraphdbview.py:22-30`
  * (the dwithin==2 fixture check).
  */
class GpkgSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tempGpkg(): String = {
    val dir = Files.createTempDirectory("graft-gpkg")
    dir.resolve("graph.gpkg").toString
  }

  test("sqlite varint and record codec round-trip") {
    for (v <- Seq(0L, 1L, 127L, 128L, 16383L, 16384L, 1L << 40, (1L << 56) + 5, -1L, Long.MinValue)) {
      val bytes = SqliteFile.varint(v)
      var x = 0L; var i = 0; var done = false
      while (!done) {
        val b = bytes(i) & 0xFF
        if (i == 8) { x = (x << 8) | b; done = true }
        else { x = (x << 7) | (b & 0x7F); done = (b & 0x80) == 0 }
        i += 1
      }
      assert(x == v, s"varint($v)")
      assert(i == bytes.length)
    }
  }

  test("create-table parsing handles both PRIMARY KEY forms and quoting") {
    // the reference's table-constraint form (feature_table.py:91-99)
    val (cols, alias) = SqliteFile.parseCreateTable(
      "CREATE TABLE edges ( fid INTEGER, geom TEXT, PRIMARY KEY (fid) )")
    assert(cols.map(_.name) == Seq("fid", "geom"))
    assert(alias.contains(0))
    val (cols2, alias2) = SqliteFile.parseCreateTable(
      """CREATE TABLE "t" ("id" INTEGER PRIMARY KEY, "v" DOUBLE, "b" BLOB)""")
    assert(cols2.map(_.name) == Seq("id", "v", "b"))
    assert(alias2.contains(0))
    // non-integer PK is NOT a rowid alias
    val (_, alias3) = SqliteFile.parseCreateTable(
      "CREATE TABLE t (name TEXT, PRIMARY KEY (name))")
    assert(alias3.isEmpty)
  }

  test("sqlite file: multi-leaf btrees, overflow chains, all value types round-trip") {
    val path = tempGpkg().replace(".gpkg", ".db")
    val big = "x" * 10000 // > one page: exercises the overflow chain
    val rows = (1L to 5000L).map { i =>
      Seq[Any](i, s"name$i", i * 1.5, if (i % 7 == 0) null else i * 3,
        if (i == 42) big else "s", Array[Byte](1, 2, (i % 127).toByte))
    }
    SqliteFile.write(path, Seq(SqliteFile.TableDef("t",
      "CREATE TABLE t (id INTEGER PRIMARY KEY, name TEXT, v DOUBLE, n INTEGER, s TEXT, b BLOB)",
      6, rows.iterator)), applicationId = 7, userVersion = 3)
    val db = SqliteFile.read(path)
    assert(db.applicationId == 7 && db.userVersion == 3)
    val t = db.tables("t")
    assert(t.rows.length == 5000)
    val r41 = t.rows(41) // id 42
    assert(r41(0) == 42L && r41(4) == big)
    val r6 = t.rows(6) // id 7: null n
    assert(r6(3) == null)
    assert(t.rows(99)(1) == "name100" && t.rows(99)(2) == 150.0)
    assert(t.rows(0)(5).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2, 1))
  }

  test("duplicate rowids in a caller-supplied frame are rejected, not written") {
    val path = tempGpkg().replace(".gpkg", ".db")
    val rows = Seq(Seq[Any](1L, "a"), Seq[Any](1L, "b"))
    val err = intercept[IllegalArgumentException] {
      SqliteFile.write(path, Seq(SqliteFile.TableDef("t",
        "CREATE TABLE t (id INTEGER PRIMARY KEY, s TEXT)", 2, rows.iterator)))
    }
    assert(err.getMessage.contains("t") && err.getMessage.contains("duplicate"))
  }

  test("write past the driver-memory ceiling fails fast with a clear pointer") {
    val path = tempGpkg().replace(".gpkg", ".db")
    val prev = sys.props.get("graft.gpkg.maxWriteBytes")
    sys.props("graft.gpkg.maxWriteBytes") = (SqliteFile.PageSize * 4L).toString
    try {
      val rows = (1L to 10000L).map(i => Seq[Any](i, "x" * 100))
      val err = intercept[IllegalArgumentException] {
        SqliteFile.write(path, Seq(SqliteFile.TableDef("t",
          "CREATE TABLE t (id INTEGER PRIMARY KEY, s TEXT)", 2, rows.iterator)))
      }
      assert(err.getMessage.contains("export-gpkg-parquet"))
    } finally prev match {
      case Some(v) => sys.props("graft.gpkg.maxWriteBytes") = v
      case None => sys.props -= "graft.gpkg.maxWriteBytes"
    }
  }

  test("gpkg export: header bytes carry the GeoPackage contract") {
    val g = PropertyGraph.fromGeoJson(spark, Seq(Fixture.path))
    val path = tempGpkg()
    GeoPackageFile.export(g, path)
    val bytes = Files.readAllBytes(Paths.get(path))
    assert(new String(bytes, 0, 15, "UTF-8") == "SQLite format 3")
    def be32(off: Int) = ((bytes(off) & 0xFF) << 24) | ((bytes(off + 1) & 0xFF) << 16) |
      ((bytes(off + 2) & 0xFF) << 8) | (bytes(off + 3) & 0xFF)
    assert(be32(68) == GeoPackageFile.ApplicationId) // "GPKG"
    assert(be32(60) == GeoPackageFile.UserVersion)
    // the full gpkg metadata table set is present
    val db = SqliteFile.read(path)
    for (t <- Seq("gpkg_contents", "gpkg_extensions", "gpkg_geometry_columns",
        "gpkg_ogr_contents", "gpkg_spatial_ref_sys", "edges", "nodes"))
      assert(db.tables.contains(t), s"missing table $t")
    assert(db.tables("gpkg_spatial_ref_sys").rows.map(_(1)).toSet == Set(-1L, 0L, 4326L))
    assert(db.tables("gpkg_geometry_columns").rows
      .map(r => (r(0), r(2))).toSet == Set(("edges", "LINESTRING"), ("nodes", "POINT")))
    assert(db.tables("gpkg_ogr_contents").rows
      .map(r => (r(0), r(1))).toSet == Set(("edges", 8L), ("nodes", 5L)))
  }

  test("gpkg round-trip: uw fixture keeps 8 edges / 5 nodes, attrs, geometry, dwithin==2") {
    val g = PropertyGraph.fromGeoJson(spark, Seq(Fixture.path))
    val path = tempGpkg()
    GeoPackageFile.export(g, path)
    val back = GeoPackageFile.importGraph(spark, path)
    assert(back.size() == 8 && back.order() == 5)
    // the reference's fixture check (test_digraphdbview.py:22-30)
    assert(back.dwithin(-122.3132940, 47.6598762, 0.1).count() == 2)
    // attribute and geometry fidelity, row-for-row
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("_u"), col("_v"), round(col("_length"), 9).as("len"),
        to_json(col("geom")).as("gj"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getString(3))).toSet
    assert(key(back.edges) == key(g.edges))
    val nodeKeys = (df: org.apache.spark.sql.DataFrame) => df
      .select(col("_n"), to_json(col("geom")).as("gj"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(nodeKeys(back.nodes) == nodeKeys(g.nodes))
  }

  test("gpkg written by real SQLite with the reference's DDL imports back") {
    // the reverse interop direction: a .gpkg produced by an actual SQLite
    // implementation running the reference's own DDL (UNIQUE constraints →
    // autoindex b-trees in sqlite_master, geopackage/__init__.py:114-192;
    // ALTER TABLE ADD for _u/_v/_n, geopackagenetwork/__init__.py:60-67)
    // must import into the same graph
    val python = Seq("/usr/bin/python3", "/usr/local/bin/python3")
      .find(p => Files.isExecutable(Paths.get(p)))
    assume(python.isDefined, "python3 not available")
    val g = PropertyGraph.fromGeoJson(spark, Seq(Fixture.path))
    val dir = Files.createTempDirectory("graft-gpkg-ref")
    val dataJson = dir.resolve("edges.json")
    val esc = (s: String) => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val lines = g.edges.orderBy("fid")
      .select(col("fid"), col("_u"), col("_v"), col("_length"),
        to_json(col("geom.coordinates")).as("cj"))
      .collect().map(r =>
        s"""{"fid":${r.getLong(0)},"u":${esc(r.getString(1))},"v":${esc(r.getString(2))},""" +
          s""""len":${r.getDouble(3)},"coords":${r.getString(4)}}""")
    Files.writeString(dataJson, lines.mkString("\n"))
    val gpkg = dir.resolve("ref.gpkg").toString
    val script =
      s"""import sqlite3, json, struct
         |con = sqlite3.connect("$gpkg")
         |con.execute("PRAGMA application_id = 1196444487")
         |con.execute("PRAGMA user_version = 10200")
         |con.execute('''CREATE TABLE gpkg_contents (table_name TEXT, data_type TEXT NOT NULL,
         |  identifier TEXT UNIQUE, description TEXT DEFAULT '',
         |  last_change TIMESTAMP DEFAULT CURRENT_TIMESTAMP,
         |  min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER,
         |  PRIMARY KEY (table_name))''')
         |con.execute('''CREATE TABLE gpkg_geometry_columns(table_name TEXT UNIQUE NOT NULL,
         |  column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL,
         |  srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m TINYINT NOT NULL,
         |  PRIMARY KEY (table_name, column_name))''')
         |con.execute('''CREATE TABLE gpkg_spatial_ref_sys(srs_name TEXT NOT NULL,
         |  srs_id INTEGER NOT NULL, organization TEXT NOT NULL,
         |  organization_coordsys_id INTEGER NOT NULL, definition TEXT NOT NULL,
         |  description TEXT, PRIMARY KEY (srs_id))''')
         |con.execute("CREATE TABLE edges (fid INTEGER, geom TEXT, PRIMARY KEY (fid))")
         |con.execute("CREATE TABLE nodes (fid INTEGER, geom TEXT, PRIMARY KEY (fid))")
         |con.execute("ALTER TABLE nodes ADD _n TEXT")
         |con.execute("ALTER TABLE edges ADD _u TEXT")
         |con.execute("ALTER TABLE edges ADD _v TEXT")
         |con.execute("ALTER TABLE edges ADD _layer TEXT")
         |con.execute("ALTER TABLE edges ADD _length DOUBLE")
         |con.execute("CREATE UNIQUE INDEX nodes_n_index ON nodes (_n)")
         |con.execute("CREATE INDEX edges_u_index ON edges (_u)")
         |# the reference's build pipeline always adds an rtree spatial index
         |# (build.py:39-40, feature_table.py:294): a VIRTUAL table with
         |# rootpage=0 in sqlite_master plus its _node/_parent/_rowid shadow
         |# b-trees — the importer must skip the virtual row, not walk page 0
         |con.execute("CREATE VIRTUAL TABLE rtree_edges_geom USING rtree(id, minx, maxx, miny, maxy)")
         |con.execute("INSERT INTO gpkg_contents (table_name, data_type, identifier, srs_id) VALUES ('edges','features','edges',4326), ('nodes','features','nodes',4326)")
         |con.execute("INSERT INTO gpkg_geometry_columns VALUES ('edges','geom','LINESTRING',4326,0,0), ('nodes','geom','POINT',4326,0,0)")
         |con.execute("INSERT INTO gpkg_spatial_ref_sys VALUES ('WGS 84 geodetic',4326,'EPSG',4326,'GEOGCS...',NULL)")
         |def gp(wkb):
         |    return b"GP\\x00\\x01" + struct.pack("<i", 4326) + wkb
         |def line(coords):
         |    out = struct.pack("<bII", 1, 2, len(coords))
         |    for x, y in coords: out += struct.pack("<dd", x, y)
         |    return gp(out)
         |def point(x, y):
         |    return gp(struct.pack("<bI", 1, 1) + struct.pack("<dd", x, y))
         |nodes = {}
         |for l in open("$dataJson"):
         |    e = json.loads(l)
         |    con.execute("INSERT INTO edges (fid, geom, _u, _v, _layer, _length) VALUES (?,?,?,?,?,?)",
         |        (e["fid"], line(e["coords"]), e["u"], e["v"], "star", e["len"]))
         |    xs = [c[0] for c in e["coords"]]; ys = [c[1] for c in e["coords"]]
         |    con.execute("INSERT INTO rtree_edges_geom VALUES (?,?,?,?,?)",
         |        (e["fid"], min(xs), max(xs), min(ys), max(ys)))
         |    nodes[e["u"]] = tuple(e["coords"][0])
         |    nodes[e["v"]] = tuple(e["coords"][-1])
         |for i, (n, c) in enumerate(sorted(nodes.items()), start=1):
         |    con.execute("INSERT INTO nodes (fid, geom, _n) VALUES (?,?,?)", (i, point(*c), n))
         |con.commit(); con.close()
         |print("WRITTEN")
         |""".stripMargin
    val proc = new ProcessBuilder(python.get, "-c", script)
      .redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    assert(proc.waitFor() == 0 && out.contains("WRITTEN"), out)
    val back = GeoPackageFile.importGraph(spark, gpkg)
    assert(back.size() == 8 && back.order() == 5)
    assert(back.dwithin(-122.3132940, 47.6598762, 0.1).count() == 2)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("_u"), col("_v"), round(col("_length"), 9).as("len"),
        to_json(col("geom")).as("gj"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getString(3))).toSet
    assert(key(back.edges) == key(g.edges))
  }

  test("unicode and exotic attribute values survive the gpkg round trip") {
    import spark.implicits._
    val edges = Seq(
      ("a", "b", """quoted "name" with \ backslash""", 1.5, 7L),
      ("b", "a", "héllo wörld — प्रीमियम 北京 🚀", -2.25, -7L),
      ("a", "c", null.asInstanceOf[String], 0.0, 0L))
      .toDF("_u", "_v", "note", "w", "n")
      .withColumn("geom", org.apache.spark.sql.functions.struct(
        org.apache.spark.sql.functions.lit("LineString").as("type"),
        org.apache.spark.sql.functions.typedLit(
          Seq(Seq(0.0, 0.0), Seq(1.0, 1.0))).as("coordinates")))
    val g = new PropertyGraph(
      graft.ingest.GeoJsonIngest.deriveNodes(edges), edges)
    val path = tempGpkg()
    GeoPackageFile.export(g, path)
    val back = GeoPackageFile.importGraph(spark, path)
    val rows = back.edges.select("_u", "_v", "note", "w", "n")
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)), r.getDouble(3), r.getLong(4))).toSet
    assert(rows == Set(
      ("a", "b", Some("""quoted "name" with \ backslash"""), 1.5, 7L),
      ("b", "a", Some("héllo wörld — प्रीमियम 北京 🚀"), -2.25, -7L),
      ("a", "c", None, 0.0, 0L)))
  }

  test("an empty graph round-trips as empty feature tables") {
    import spark.implicits._
    val geomType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("coordinates",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_u", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_v", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("geom", geomType)))
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    val g = new PropertyGraph(
      empty.select(org.apache.spark.sql.functions.col("_u").as("_n"),
        org.apache.spark.sql.functions.col("geom")).limit(0), empty)
    val path = tempGpkg()
    GeoPackageFile.export(g, path)
    val back = GeoPackageFile.importGraph(spark, path)
    assert(back.size() == 0 && back.order() == 0)
    // real SQLite still validates the file when available
    val python = Seq("/usr/bin/python3", "/usr/local/bin/python3")
      .find(p => Files.isExecutable(Paths.get(p)))
    python.foreach { py =>
      val proc = new ProcessBuilder(py, "-c",
        s"""import sqlite3; con = sqlite3.connect("$path"); """ +
        """ok, = con.execute("PRAGMA integrity_check").fetchone(); """ +
        """assert ok == "ok", ok; """ +
        """assert con.execute("SELECT count(*) FROM edges").fetchone()[0] == 0; print("OK")""")
        .redirectErrorStream(true).start()
      val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
      assert(proc.waitFor() == 0 && out.contains("OK"), out)
    }
  }

  test("a .gpkg is a build input like any OGR file (io.py:10-13 parity)") {
    val g = PropertyGraph.fromGeoJson(spark, Seq(Fixture.path))
    val path = tempGpkg()
    GeoPackageFile.export(g, path)
    val rebuilt = PropertyGraph.fromGeoJson(spark, Seq(path))
    assert(rebuilt.size() == 8 && rebuilt.order() == 5)
    assert(rebuilt.dwithin(-122.3132940, 47.6598762, 0.1).count() == 2)
  }

  test("gpkg is readable by a real SQLite implementation (python3 stdlib)") {
    val python = Seq("/usr/bin/python3", "/usr/local/bin/python3")
      .find(p => Files.isExecutable(Paths.get(p)))
    assume(python.isDefined, "python3 not available")
    val g = PropertyGraph.fromGeoJson(spark, Seq(Fixture.path))
    val path = tempGpkg()
    GeoPackageFile.export(g, path)
    val script =
      s"""import sqlite3, sys
         |con = sqlite3.connect("$path")
         |ok, = con.execute("PRAGMA integrity_check").fetchone()
         |assert ok == "ok", ok
         |n, = con.execute("SELECT count(*) FROM edges").fetchone()
         |assert n == 8, n
         |m, = con.execute("SELECT count(*) FROM nodes").fetchone()
         |assert m == 5, m
         |fids = [r[0] for r in con.execute("SELECT fid FROM edges ORDER BY fid")]
         |assert fids == list(range(1, 9)), fids
         |us = {r[0] for r in con.execute("SELECT _u FROM edges")}
         |assert "-122.3141965, 47.659887" in us, us
         |blob, = con.execute("SELECT geom FROM edges WHERE fid = 1").fetchone()
         |assert bytes(blob[:2]) == b"GP", blob[:2]
         |srs = {r[0] for r in con.execute("SELECT srs_id FROM gpkg_spatial_ref_sys")}
         |assert srs == {-1, 0, 4326}, srs
         |print("SQLITE_OK")
         |""".stripMargin
    val proc = new ProcessBuilder(python.get, "-c", script)
      .redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    assert(proc.waitFor() == 0 && out.contains("SQLITE_OK"), out)
  }
}
