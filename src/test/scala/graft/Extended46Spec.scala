package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-46 operators against hand-computed fixtures. */
class Extended46Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("tp18 epochs: ceil division, cap at 4, explode count = docs x epochs") {
    import spark.implicits._
    // srcA: 2 docs, 1000 chars (the max); srcB: 1 doc, 300 chars ->
    // ceil(1000/300) = 4 (capped exactly at 4); srcC: 1 doc, 100 -> cap 4
    val docs = Seq(
      (0L, "a", "en", "srcA", 600L), (1L, "b", "en", "srcA", 400L),
      (2L, "c", "en", "srcB", 300L),
      (3L, "d", "en", "srcC", 100L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("e46spec").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.queries.Extended46.queries("tp18_domain_upsample")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toList
    assert(out == List(("srcA", 2L, 1L, 2L), ("srcB", 1L, 4L, 4L),
      ("srcC", 1L, 4L, 4L)))
  }

  test("e24 quintile boundaries bucket ties together, never split") {
    import spark.implicits._
    // 10 customers, one order each, all with the SAME totalprice: every
    // customer must land in the same monetary bucket (ntile would split
    // them 2-2-2-2-2); recency/frequency also uniform -> ONE segment row
    val base = java.sql.Timestamp.valueOf("1995-06-01 00:00:00")
    val orders = (1L to 10L).map(i => (i, i, base, 100.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val tmp = java.nio.file.Files.createTempDirectory("e46spec2").toString
    orders.write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val out = graft.queries.Extended46.queries("e24_rfm_segments")(spark, tmp)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toList
    assert(out == List((111, 10L)))
  }
}
