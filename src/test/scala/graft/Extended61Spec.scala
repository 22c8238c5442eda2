package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-61 operators: exact-N deterministic sampling. */
class Extended61Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("tp22 returns exactly N docs and is reproducible across runs") {
    val run1 = graft.queries.Extended61.queries("tp22_uniform_sample_n")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1))).toList
    val run2 = graft.queries.Extended61.queries("tp22_uniform_sample_n")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1))).toList
    assert(run1 == run2)
    assert(run1.size == 100)
    assert(run1.map(_._1).distinct.size == 100)
  }

  test("tp22 takes exactly the 100 smallest md5 keys (local restatement)") {
    val got = graft.queries.Extended61.queries("tp22_uniform_sample_n")(spark, d)
      .collect().map(_.getLong(0)).toSet
    val want = Tables.t(spark, d, "documents")
      .select(col("doc_id"),
        md5(col("doc_id").cast("string").cast("binary")).as("k"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._2).take(100).map(_._1).toSet
    assert(got == want)
  }

  test("tp23 yields exactly k docs per language, the k smallest keys of each") {
    val got = graft.queries.Extended61.queries("tp23_per_domain_sample")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    val perLang = got.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val docs = Tables.t(spark, d, "documents")
      .select(col("lang"), col("doc_id"),
        md5(col("doc_id").cast("string").cast("binary")).as("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val langs = docs.map(_._1).distinct
    assert(perLang.keySet == langs.toSet)
    langs.foreach { l =>
      val want = docs.filter(_._1 == l).sortBy(t => (t._3, t._2))
        .take(5).map(_._2).toList.sorted
      assert(perLang(l) == want, s"lang $l sample mismatch")
    }
  }

  test("tp23 per-group quota holds even when a group has fewer than k rows") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("e61spec").toString
    Seq((1L, "a b", "en", "s", 2L), (2L, "c d", "en", "s", 2L),
      (3L, "e f", "fr", "s", 2L), (4L, "g h", "en", "s", 2L),
      (5L, "i j", "en", "s", 2L), (6L, "k l", "en", "s", 2L),
      (7L, "m n", "en", "s", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.queries.Extended61.queries("tp23_per_domain_sample")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(got.count(_._1 == "en") == 5) // capped at k
    assert(got.count(_._1 == "fr") == 1) // undersized group passes through whole
  }
}
