package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.graph.PropertyGraph
import graft.route.Route

/** Batch-30 centrality additions: closed-form equality on the micro
  * fixture plus gated-vs-distributed parity (the r7/r8 oracle queries pin
  * the distributed path at sf0.01; here the driver fast path faces the
  * same numbers).
  */
class Extended30Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** 5-node unit chain a-b-c-d-e (bidirected by ingest reversal). */
  private lazy val chain: PropertyGraph = {
    val dir = java.nio.file.Files.createTempDirectory("e30chain")
    val feats = (0 until 4).map { i =>
      val x0 = 8.0 + i * 0.01; val x1 = 8.0 + (i + 1) * 0.01
      s"""{"type":"Feature","properties":{"w":1},
         |"geometry":{"type":"LineString","coordinates":[[$x0,45.0],[$x1,45.0]]}}""".stripMargin
    }.mkString(",")
    val p = dir.resolve("chain.geojson")
    java.nio.file.Files.writeString(p,
      s"""{"type":"FeatureCollection","features":[$feats]}""")
    PropertyGraph.fromGeoJson(spark, Seq(p.toString))
  }

  private def allNodes = chain.nodes.select("_n").collect().map(_.getString(0)).toSeq

  test("eccentricity on the 5-chain is max(j, 4-j), gated == distributed") {
    val local = Route.eccentricity(spark, chain, allNodes, "w")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dist = Route.eccentricity(spark, chain, allNodes, "w", maxLocalEdges = -1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(local == dist)
    // chain ids sort by longitude, so sorted node ids are chain order
    val ordered = allNodes.sorted
    ordered.zipWithIndex.foreach { case (n, j) =>
      assert(local(n) == math.max(j, 4 - j).toDouble)
    }
  }

  test("harmonic on the 5-chain folds 1/d ascending, gated == distributed") {
    val local = Route.harmonic(spark, chain, allNodes, "w")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dist = Route.harmonic(spark, chain, allNodes, "w", maxLocalEdges = -1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(local == dist)
    val ordered = allNodes.sorted
    ordered.zipWithIndex.foreach { case (n, j) =>
      val ds = ((1 to j) ++ (1 to (4 - j))).map(_.toDouble).sorted
      val want = ds.foldLeft(0.0)((acc, d) => acc + 1.0 / d)
      assert(local(n) == want) // bit-exact: same ascending IEEE fold
    }
  }
}
