package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-48 operators against hand-computed fixtures. */
class Extended48Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("assortativity on the sf0.001 graph matches an independent local recomputation") {
    val d = "/root/testdata/sf0.001"
    val edges = graft.queries.Extended42.sparseSupernodeEdges(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = edges.flatMap { case (u, v) => Seq(u, v) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val jk = edges.map { case (u, v) => (deg(u), deg(v)) }
    val m = jk.length.toLong
    val s1 = jk.map { case (j, k) => j + k }.sum
    val s2 = jk.map { case (j, k) => j * k }.sum
    val s3 = jk.map { case (j, k) => j * j + k * k }.sum
    val expected = BigDecimal((4 * m * s2 - s1 * s1).toDouble /
      (2 * m * s3 - s1 * s1).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = graft.queries.Extended48.queries("j22_assortativity")(spark, d)
      .collect().head
    assert(out.getLong(0) == m)
    assert(out.getDouble(1) == expected)
  }

  test("v7 agreement is 1.0 when all labels match, denominators cap at subset size") {
    import spark.implicits._
    // 4 subset vectors (ids 0,7,14,21), all label 9: only 3 neighbours
    // each (n_nn = 3 < 10), all agreeing -> frac 1.0
    val rows = (0 until 28).map { i =>
      (i.toLong, Array.fill(8)(((i % 5) + 1).toFloat), 9)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val tmp = java.nio.file.Files.createTempDirectory("e48spec").toString
    df.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = graft.queries.Extended48.queries("v7_knn_label_agreement")(
        spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(4))).toList
    assert(out.map(_._1) == List(0L, 7L, 14L, 21L))
    assert(out.forall { case (_, nnn, frac) => nnn == 3L && frac == 1.0 })
  }
}
