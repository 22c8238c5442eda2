package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-68 operators: Benford digit profile and dup-cluster histogram. */
class Extended68Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("a32 digit shares sum to one and contributions match a local replay") {
    val got = graft.queries.Extended68.queries("a32_benford")(spark, d)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toList
    assert(got.map(_._1) == got.map(_._1).sorted)
    assert(got.map(_._1).toSet.subsetOf((1 to 9).toSet))

    val cents = Tables.t(spark, d, "lineitem")
      .select(round(col("l_extendedprice") * 100).cast("long"))
      .collect().map(_.getLong(0))
    val byDigit = cents.groupBy(_.toString.head.asDigit).view
      .mapValues(_.size.toLong).toMap
    val tot = cents.length.toLong
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-12)
    got.foreach { case (dig, n, share, exp, contrib) =>
      assert(n == byDigit(dig), s"digit $dig")
      assert(share == n.toDouble / tot.toDouble)
      assert(contrib == (share - exp) * (share - exp) / exp)
    }
  }

  test("tp26 histogram accounts for every document exactly once") {
    val got = graft.queries.Extended68.queries("tp26_cluster_profile")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    val nDocs = Tables.t(spark, d, "documents").count()
    assert(got.map { case (sz, k) => sz * k }.sum == nDocs)
    // no zero or negative sizes; sorted ascending
    assert(got.forall { case (sz, k) => sz >= 1 && k >= 1 })
    assert(got.map(_._1) == got.map(_._1).sorted)
    // consistency with the keep-set size of dedup_near_pipeline: kept =
    // one representative per multi-cluster + all singletons
    val kept = graft.queries.LlmQueries.queries("dedup_near_pipeline")(spark, d)
      .count()
    assert(got.map(_._2).sum == kept)
  }
}
