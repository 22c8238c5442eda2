package graft.queries

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.PropertyGraph

/** Graph-engine throughput workloads, sized to the reference's own
  * performance contracts (BASELINE.md) so BENCH numbers are directly
  * comparable:
  *
  *  - `graphbuild_11300_edges`: ingest 5,650 LineString features →
  *    11,300 edges with reversals, node derivation and lengths — the
  *    batch form of the reference's "100 × uw.geojson imports (~11.3k
  *    inserts) < 10 s" gate (`tests/test_build.py:24-35`).
  *  - `graphupdate_1000_edges`: batch-update 1,000 edge attributes via the
  *    key join — the reference's "1000 updates < 0.5 s" gate
  *    (`tests/test_digraphdb.py:38-53`).
  *
  * No oracle (graph ops, not SQL) — the driver records rows>0; exact
  * semantics are pinned by PropertyGraphSpec/OperatorSpec.
  */
object GraphBenchQueries {
  type Q = (SparkSession, String) => DataFrame

  private[graft] lazy val bulkFile: String = {
    val dir = Files.createTempDirectory("graft-bulk")
    val features = (0 until 5650).map { i =>
      val x = -122.0 + (i % 100) * 0.001
      val y = 47.0 + (i / 100) * 0.001
      s"""{"type":"Feature","properties":{"length":${i % 97}},
          "geometry":{"type":"LineString","coordinates":[[$x,$y],[${x + 0.0005},$y]]}}"""
    }.mkString(",")
    val p = dir.resolve("bulk.geojson")
    Files.writeString(p,
      s"""{"type": "FeatureCollection", "features": [$features]}""")
    p.toString
  }

  val queries: Map[String, Q] = Map(
    "graphbuild_11300_edges" -> ((s, _) =>
      PropertyGraph.fromGeoJson(s, Seq(bulkFile)).edges
        .select("_u", "_v", "_length", "fid")),
    // real single-file GeoPackage round trip through the byte-level SQLite
    // writer/reader (graft.store.SqliteFile/GeoPackageFile): build 11,300
    // edges, export .gpkg, import, return the re-read edges. Rows-only
    // here; byte-level and real-SQLite gates live in GpkgSpec.
    "s10_gpkg_roundtrip" -> ((s, _) => {
      val g = PropertyGraph.fromGeoJson(s, Seq(bulkFile))
      val out = Files.createTempDirectory("graft-gpkg-rt").resolve("g.gpkg").toString
      graft.store.GeoPackageFile.export(g, out)
      graft.store.GeoPackageFile.importGraph(s, out).edges
        .select("_u", "_v", "_length", "fid").orderBy("fid")
    }),
    "graphupdate_1000_edges" -> ((s, _) => {
      import s.implicits._
      val n = 1000
      // 2 slices, not defaultParallelism: scheduling 32 tasks per stage for
      // a 1000-row batch is pure overhead — partition count should track
      // data volume, the same rule that sizes partitions at 100 TB
      val base = s.sparkContext
        .parallelize((0 until n).map(i => (s"u$i", s"v$i", i.toDouble)), 2)
        .toDF("_u", "_v", "w")
      val g = new PropertyGraph(base.select(col("_u").as("_n")).distinct(), base)
      val updates = s.sparkContext
        .parallelize((0 until n).map(i => (s"u$i", s"v$i", 5.4)), 2)
        .toDF("_u", "_v", "weight")
      g.updateEdges(updates).edges.filter(col("weight") === 5.4)
    })
  )

  val oracleSql: Map[String, String] = Map()
}
