package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-38 operators against local recomputations at sf0.001 (DuckDB
  * hash gate at sf0.01 via Verify/oracle_check).
  */
class Extended38Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  test("tp12 alpha mixing flattens the source distribution deterministically") {
    val rows = graft.queries.Extended38.queries("tp12_alpha_mixing")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bySrc = rows.groupBy(_._1).map { case (k, v) => k -> v.length }
    val ns = Tables.t(spark, d, "documents").groupBy("source")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // quotas: floor(200 * sqrt(n_s) / sum(sqrt)) with source-sorted fold
    val sw = ns.toSeq.sortBy(_._1).map(kv => math.sqrt(kv._2.toDouble))
      .foldLeft(0.0)(_ + _)
    ns.foreach { case (src, n) =>
      val k = math.floor(200.0 * math.sqrt(n.toDouble) / sw).toLong
      assert(bySrc.getOrElse(src, 0).toLong == math.min(k, n), s"source $src")
    }
    // alpha < 1 flattens: kept share of a small source exceeds its raw share
    val total = ns.values.sum.toDouble
    val small = ns.minBy(_._2)
    if (ns.size > 1 && small._2 < total / ns.size) {
      val keptShare = bySrc(small._1).toDouble / rows.length
      assert(keptShare > small._2 / total)
    }
  }

  test("st10 streaming enrichment equals the batch e7 aggregate") {
    val st = graft.queries.Extended38.queries("st10_stream_enrich")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val batch = SparkEntry.queries("e7_enrich_join")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(st == batch && st.nonEmpty)
  }
}
