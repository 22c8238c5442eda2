package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.route.Matching

/** Batch-44 operators: greedy matching (both dispatch paths = the
  * sequential greedy definition) and the exact-integer PPR fixpoint.
  */
class Extended44Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("greedy matching takes the cheap edge and blocks its neighbors") {
    import spark.implicits._
    // path 1-2-3-4 with weights 1, 2, 3: greedy takes (1,2) then (3,4);
    // the middle edge is blocked
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 2.0), (3L, 4L, 3.0)).toDF("u", "v", "w")
    val expected = Set((1L, 2L), (3L, 4L))
    assert(edgeSet(Matching.greedyMatching(spark, edges)) == expected)
    assert(edgeSet(Matching.greedyMatching(spark, edges, maxLocalEdges = 0)) ==
      expected)
  }

  test("weight ties break on (u, v): star picks the lowest-ordered leaf") {
    import spark.implicits._
    val star = Seq((1L, 2L, 5.0), (1L, 3L, 5.0), (1L, 4L, 5.0)).toDF("u", "v", "w")
    assert(edgeSet(Matching.greedyMatching(spark, star)) == Set((1L, 2L)))
    assert(edgeSet(Matching.greedyMatching(spark, star, maxLocalEdges = 0)) ==
      Set((1L, 2L)))
  }

  test("local and distributed paths agree on the sf0.001 supernode graph") {
    val edges = graft.queries.Extended41.supernodeEdges(spark, d)
    val local = edgeSet(Matching.greedyMatching(spark, edges))
    val dist = edgeSet(Matching.greedyMatching(spark, edges, maxLocalEdges = 0))
    assert(local == dist)
    assert(local.nonEmpty)
    // maximality: no surviving edge has both endpoints free
    import spark.implicits._
    val matchedNodes = local.flatMap { case (u, v) => Seq(u, v) }
    val all = edges.select(col("u").cast("long"), col("v").cast("long"))
      .as[(Long, Long)].collect()
    assert(all.forall { case (u, v) =>
      matchedNodes.contains(u) || matchedNodes.contains(v) })
  }

  test("exact-integer PPR: restart node dominates and mass is conserved sanely") {
    val out = graft.queries.Extended44.queries("r10_personalized_pagerank")(
        spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 0 holds the restart mass, so it must be the max
    assert(out(0L) == out.values.max)
    // every rank is in [0, scale]
    assert(out.values.forall(v => v >= 0 && v <= 1000000000000L))
  }
}
