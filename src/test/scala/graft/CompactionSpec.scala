package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.PropertyGraph
import graft.ingest.GeoJsonIngest
import graft.store.GraphPackage

/** GraphPackage.compact: collapses accreted small files while preserving
  * the package's logical content, layout contract, and metadata.
  */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** A grid of short LineStrings spanning several 0.01-degree cells. */
  private lazy val gridGeoJson: String = {
    val feats = for {
      i <- 0 until 9; j <- 0 until 9
      x = -0.02 + i * 0.005; y = -0.02 + j * 0.005
    } yield
      s"""{"type": "Feature", "properties": {"i": ${i * 9 + j}},
         | "geometry": {"type": "LineString", "coordinates":
         |   [[$x, $y], [${x + 0.004}, ${y + 0.004}]]}}""".stripMargin
    s"""{"type": "FeatureCollection", "features": [${feats.mkString(",")}]}"""
  }

  private def countParquet(dir: String): Long = GraphPackage.countDataFiles(dir)

  test("compact shrinks the file count without changing the package's content") {
    val tmp = Files.createTempDirectory("graft-compact")
    val in = tmp.resolve("grid.geojson")
    Files.writeString(in, gridGeoJson)
    val g = PropertyGraph.fromGeoJson(spark, Seq(in.toString), GeoJsonIngest.Options())
    // fragment the layout the way many incremental writes would
    val frag = new PropertyGraph(g.nodes.repartition(13), g.edges.repartition(13), g.cellDeg)
    val pkg = tmp.resolve("pkg").toString
    GraphPackage.save(frag, pkg)

    val before = countParquet(pkg)
    val pre = GraphPackage.load(spark, pkg)
    val edgesBefore = pre.edges.select("_u", "_v").orderBy("_u", "_v")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val nodesBefore = pre.nodes.select("_n").orderBy("_n").collect().map(_.getString(0))
    val dwBefore = pre.dwithin(0.0, 0.0, 400.0, sort = true)
      .select("_u", "_v").collect().map(r => (r.getString(0), r.getString(1)))

    GraphPackage.compact(spark, pkg, targetBytes = 1L << 30)
    val after = countParquet(pkg)
    assert(after < before, s"expected fewer data files, got $before -> $after")

    val post = GraphPackage.load(spark, pkg)
    assert(post.cellDeg == pre.cellDeg, "metadata (cell size) must survive compaction")
    val edgesAfter = post.edges.select("_u", "_v").orderBy("_u", "_v")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val nodesAfter = post.nodes.select("_n").orderBy("_n").collect().map(_.getString(0))
    assert(edgesAfter.sameElements(edgesBefore))
    assert(nodesAfter.sameElements(nodesBefore))
    // spatial layout still answers queries identically
    val dwAfter = post.dwithin(0.0, 0.0, 400.0, sort = true)
      .select("_u", "_v").collect().map(r => (r.getString(0), r.getString(1)))
    assert(dwAfter.nonEmpty && dwAfter.sameElements(dwBefore))
    // cell partitioning survives: edge files still live under _cell= dirs
    import scala.jdk.CollectionConverters._
    val cellDirs = Files.list(Paths.get(pkg, "edges")).iterator().asScala
      .count(_.getFileName.toString.startsWith("_cell="))
    assert(cellDirs > 1, "compacted edges must stay partitioned by grid cell")
  }

  test("compact is idempotent: a second pass changes nothing") {
    val tmp = Files.createTempDirectory("graft-compact2")
    val in = tmp.resolve("grid.geojson")
    Files.writeString(in, gridGeoJson)
    val g = PropertyGraph.fromGeoJson(spark, Seq(in.toString), GeoJsonIngest.Options())
    val pkg = tmp.resolve("pkg").toString
    GraphPackage.save(g, pkg)
    GraphPackage.compact(spark, pkg, targetBytes = 1L << 30)
    val first = countParquet(pkg)
    val edges1 = GraphPackage.load(spark, pkg).edges.count()
    GraphPackage.compact(spark, pkg, targetBytes = 1L << 30)
    assert(countParquet(pkg) == first)
    assert(GraphPackage.load(spark, pkg).edges.count() == edges1)
  }
}
