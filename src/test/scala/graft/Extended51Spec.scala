package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-51 operators against hand-computed fixtures. */
class Extended51Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("dataset card counts exact dups and word ranges per language") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c", "en", "s1", 5L),
      (1L, "a b c", "en", "s2", 5L), // exact dup of 0
      (2L, "d e f g", "en", "s1", 7L),
      (3L, "x y", "fr", "s1", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("e51spec").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.queries.Extended51.queries("tp19_dataset_card")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(5), r.getLong(6), r.getLong(7))).toList
    assert(out == List(("en", 3L, 2L, 1L, 3L, 4L), ("fr", 1L, 1L, 0L, 2L, 2L)))
  }

  test("HHI: monopoly is 1.0, equal split of n suppliers is 1/n") {
    import spark.implicits._
    // nation N0: one supplier -> hhi 1.0
    // nation N1: two suppliers with EQUAL revenue -> hhi 0.5
    val li = Seq(
      (1L, 100.0, 0.0), (1L, 100.0, 0.0),
      (2L, 300.0, 0.0), (3L, 300.0, 0.0)
    ).toDF("l_suppkey", "l_extendedprice", "l_discount")
    val supp = Seq((1L, 0L), (2L, 1L), (3L, 1L)).toDF("s_suppkey", "s_nationkey")
    val nation = Seq((0L, "N0"), (1L, "N1")).toDF("n_nationkey", "n_name")
    val tmp = java.nio.file.Files.createTempDirectory("e51spec2").toString
    li.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    supp.write.mode("overwrite").parquet(s"$tmp/supplier.parquet")
    nation.write.mode("overwrite").parquet(s"$tmp/nation.parquet")
    val out = graft.queries.Extended51.queries("a24_hhi")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toList
    assert(out == List(("N0", 1L, 1.0), ("N1", 2L, 0.5)))
  }
}
