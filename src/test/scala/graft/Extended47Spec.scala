package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.route.Components

/** Batch-47 operators against hand-computed fixtures. */
class Extended47Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("4-truss keeps K4, drops a pendant triangle via cascade") {
    import spark.implicits._
    // K4 on {1,2,3,4}: every edge in 2 triangles — survives k=4.
    // Triangle {4,5,6} hangs off node 4: each of its edges is in exactly
    // ONE triangle — all three drop in the first peel.
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L)
    ).toDF("u", "v")
    val out = edgeSet(Components.kTruss(spark, edges, 4))
    assert(out == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)))
  }

  test("truss peeling cascades: breaking one edge of a chained-triangle strip unravels it") {
    import spark.implicits._
    // strip of triangles sharing edges: (1,2,3), (2,3,4), (3,4,5) — the
    // shared edges (2,3) and (3,4) are each in 2 triangles but the rim
    // edges are in 1, so k=4 peeling unravels the WHOLE strip (cascade:
    // after rim edges drop, the shared edges lose their triangles too)
    val strip = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 5L), (4L, 5L)).toDF("u", "v")
    assert(edgeSet(Components.kTruss(spark, strip, 4)).isEmpty)
  }

  test("3-truss equals edges-in-any-triangle when no cascade applies") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("u", "v")
    assert(edgeSet(Components.kTruss(spark, edges, 3)) ==
      Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("a23 Gini: zeros for uniform values, exact hand value for a skewed group") {
    import spark.implicits._
    // nation 0: four customers with monetary 1,1,1,1 -> gini 0
    // nation 1: two customers 1 and 3 (cents 100, 300):
    //   sorted ranks: 1*100 + 2*300 = 700; gini = 2*700/(2*400) - 3/2 = 0.25
    val base = java.sql.Timestamp.valueOf("1995-06-01 00:00:00")
    val orders = Seq(
      (1L, 10L, base, 0.01), (2L, 11L, base, 0.01),
      (3L, 12L, base, 0.01), (4L, 13L, base, 0.01),
      (5L, 20L, base, 0.01), (6L, 21L, base, 0.03)
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = Seq((10L, 0L), (11L, 0L), (12L, 0L), (13L, 0L),
      (20L, 1L), (21L, 1L)).toDF("c_custkey", "c_nationkey")
    val nation = Seq((0L, "N0"), (1L, "N1")).toDF("n_nationkey", "n_name")
    val tmp = java.nio.file.Files.createTempDirectory("e47spec").toString
    orders.write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    cust.write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    nation.write.mode("overwrite").parquet(s"$tmp/nation.parquet")
    val out = graft.queries.Extended47.queries("a23_gini")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toList
    assert(out == List(("N0", 4L, 0.0), ("N1", 2L, 0.25)))
  }
}
