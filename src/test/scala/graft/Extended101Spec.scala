package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-101: rectangle motifs + reciprocity, pinned to local replays. */
class Extended101Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  private def coPairs(maxLine: Int): Seq[(Long, Long)] =
    graft.Tables.t(spark, d, "lineitem")
      .filter(col("l_linenumber") <= maxLine)
      .select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.flatMap { rows =>
        val ps = rows.map(_._2).distinct.toSeq
        for (a <- ps; b <- ps if a < b) yield (a, b)
      }.toSeq.distinct

  test("j28 rectangle count matches a local common-neighbor enumeration") {
    val row = graft.queries.Extended101.queries("j28_rectangles")(spark, d)
      .collect().head
    val edges = coPairs(3)
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    var diag = 0L
    for (i <- nodes.indices; j <- (i + 1) until nodes.length) {
      val c = (adj(nodes(i)) & adj(nodes(j))).size.toLong
      diag += c * (c - 1) / 2
    }
    assert(row.getAs[Long]("n_edges") == edges.size.toLong)
    assert(row.getAs[Long]("diag_pairs") == diag)
    assert(row.getAs[Long]("rectangles") == diag / 2)
    // diagonals pair up exactly: the identity says the sum is even
    assert(diag % 2 == 0)
  }

  test("j29 reciprocity matches a local reverse-edge scan") {
    val row = graft.queries.Extended101.queries("j29_reciprocity")(spark, d)
      .collect().head
    val li = graft.Tables.t(spark, d, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // duplicate (orderkey, linenumber) rows exist in the fixture — pair
    // EVERY line-i row with EVERY line-(i+1) row, as the join does
    val edges = li.groupBy(_._1).values.flatMap { rows =>
      for {
        a <- rows.toSeq; b <- rows.toSeq
        if b._2 == a._2 + 1 && a._3 != b._3
      } yield (a._3, b._3)
    }.toSet
    val nRecip = edges.count(e => edges.contains(e.swap)).toLong
    assert(row.getAs[Long]("n_edges") == edges.size.toLong)
    assert(row.getAs[Long]("n_recip") == nRecip)
    assert(row.getAs[Double]("reciprocity") ==
      BigDecimal(nRecip.toDouble / edges.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
