package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-108: local bridges + mixture temperature, local replays. */
class Extended108Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("j30 local bridges are exactly the triangle-free edges") {
    val got = graft.queries.Extended108.queries("j30_local_bridges")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val edges = graft.Tables.t(spark, d, "lineitem")
      .filter(col("l_linenumber") <= 3)
      .select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.flatMap { rows =>
        val ps = rows.map(_._2).distinct.toSeq
        for (a <- ps; b <- ps if a < b) yield (a, b)
      }.toSet
    val adj = (edges.toSeq ++ edges.toSeq.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val bridges = edges.filter { case (a, b) => (adj(a) & adj(b)).isEmpty }
    assert(got.head._3 == edges.size.toLong)
    assert(got.head._4 == bridges.size.toLong)
    assert(got.map(g => (g._1, g._2)).toSeq ==
      bridges.toSeq.sorted.take(10))
    // every sampled bridge is a real edge with no shared neighbor
    got.foreach { case (a, b, _, _, _) =>
      assert(edges((a, b)) && (adj(a) & adj(b)).isEmpty, s"($a,$b)")
    }
  }

  test("tp39 temperature weights match a local fold and boost the tail") {
    val got = graft.queries.Extended108.queries("tp39_mixture_temperature")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val counts = graft.Tables.t(spark, d, "documents")
      .select(col("lang"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (l, v) => l -> v.map(_._2).sum }
    val total = counts.values.sum.toDouble
    val ptau = counts.map { case (l, c) => l -> math.pow(c / total, 0.7) }
    val z = ptau.toSeq.sortBy(_._1).map(_._2).sum
    counts.foreach { case (l, c) =>
      val p = c / total
      assert(got(l)._1 == c, s"$l tokens")
      assert(math.abs(got(l)._2 - p) < 1e-6, s"$l p")
      assert(math.abs(got(l)._3 - ptau(l) / z) < 1e-6, s"$l p_temp")
      assert(math.abs(got(l)._4 - ptau(l) / z / p) < 1e-4, s"$l upsample")
    }
    // temperature < 1 compresses: rare langs upsample, dominant ones shrink
    val minLang = counts.minBy(_._2)._1
    val maxLang = counts.maxBy(_._2)._1
    if (counts(minLang) != counts(maxLang)) {
      assert(got(minLang)._4 >= got(maxLang)._4)
      assert(got(minLang)._4 >= 1.0 - 1e-9)
    }
    // weights sum to 1
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 1e-6)
  }
}
