package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.route.Bridges

/** Batch-42 operators: bridges (both dispatch paths) and dup-span
  * interval coverage against hand-computed fixtures.
  */
class Extended42Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bridges on a hand-built fixture: tree edges yes, cycle edges no") {
    import spark.implicits._
    // two triangles (1-2-3, 5-6-7) joined by the bridge 3-5, plus a
    // pendant 7-8: bridges are exactly {(3,5), (7,8)}
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 5L),
      (5L, 6L), (6L, 7L), (5L, 7L),
      (7L, 8L)
    ).toDF("u", "v")
    val expected = Set((3L, 5L), (7L, 8L))
    assert(edgeSet(Bridges.bridges(spark, edges)) == expected)
    assert(edgeSet(Bridges.bridges(spark, edges, maxLocalEdges = 0)) == expected)
  }

  test("bridges of a pure tree are all edges; of a cycle, none") {
    import spark.implicits._
    val tree = Seq((1L, 2L), (2L, 3L), (2L, 4L), (4L, 5L)).toDF("u", "v")
    assert(edgeSet(Bridges.bridges(spark, tree)) ==
      Set((1L, 2L), (2L, 3L), (2L, 4L), (4L, 5L)))
    assert(edgeSet(Bridges.bridges(spark, tree, maxLocalEdges = 0)) ==
      Set((1L, 2L), (2L, 3L), (2L, 4L), (4L, 5L)))
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("u", "v")
    assert(edgeSet(Bridges.bridges(spark, cycle)).isEmpty)
    assert(edgeSet(Bridges.bridges(spark, cycle, maxLocalEdges = 0)).isEmpty)
  }

  test("distributed XOR-cover equals local Tarjan on the sf0.001 supernode graph") {
    val edges = graft.queries.Extended42.sparseSupernodeEdges(spark, d)
    val local = edgeSet(Bridges.bridges(spark, edges))
    val dist = edgeSet(Bridges.bridges(spark, edges, maxLocalEdges = 0))
    assert(local == dist)
    assert(local.nonEmpty) // 16 bridges at sf0.001 — real signal
  }

  test("distributed path handles disconnected graphs and isolated cycles") {
    import spark.implicits._
    // component A: path 1-2-3 (both edges bridges); component B: triangle
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("u", "v")
    val expected = Set((1L, 2L), (2L, 3L))
    assert(edgeSet(Bridges.bridges(spark, edges)) == expected)
    assert(edgeSet(Bridges.bridges(spark, edges, maxLocalEdges = 0)) == expected)
  }

  test("dup-span coverage merges overlapping spans into interval unions") {
    import spark.implicits._
    // doc A and doc B share the 6-word prefix "a b c d e f" → dup
    // 5-grams at positions 0 and 1 → merged interval [0, 6) → 6 covered
    // words each; doc C is disjoint → 0.
    val docs = Seq(
      (0L, "a b c d e f x1 y1 z1 w1"),
      (1L, "a b c d e f x2 y2 z2"),
      (2L, "p q r s t u v w")
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("e42spec").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.queries.Extended42.queries("tp15_dup_span_coverage")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(out == List((0L, 10L, 6L), (1L, 9L, 6L), (2L, 8L, 0L)))
  }
}
