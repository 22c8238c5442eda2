package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-60 operators: bloom-pruned decontamination, count-min sketch,
  * streaming redelivery dedup.
  */
class Extended60Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("e60spec").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("bloom decontamination flags exactly the docs sharing a 5-gram with the benchmark slice") {
    // doc 3 (3 % 17 == 3) is benchmark; doc 4 copies its opening 5-gram,
    // doc 5 shares no 5-gram, doc 22 shares the tail 5-gram.
    val tmp = writeDocs(Seq(
      (3L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 1L),
      (4L, "alpha beta gamma delta epsilon completely different tail", "en", "s", 1L),
      (5L, "one two three four five six seven eight", "en", "s", 1L),
      (22L, "prefix words here delta epsilon zeta eta theta", "fr", "s", 1L),
      (23L, "short text", "fr", "s", 1L) // < 5 words: never contaminated
    ))
    val out = graft.queries.Extended60.queries("tp21_bloom_decontaminate")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    assert(out == List(("en", 2L, 1L), ("fr", 2L, 1L)))
  }

  test("bloom decontamination with an empty benchmark slice reports zero contamination") {
    val tmp = writeDocs(Seq(
      (1L, "one two three four five", "en", "s", 1L),
      (2L, "six seven eight nine ten", "en", "s", 1L)
    ))
    val out = graft.queries.Extended60.queries("tp21_bloom_decontaminate")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    assert(out == List(("en", 2L, 0L)))
  }

  test("bloom pre-filter is correctness-invisible: result equals the exact join without it") {
    // run on the real sf0.001 tables where planted cross-doc dup spans exist
    val d = "/root/testdata/sf0.001"
    val got = graft.queries.Extended60.queries("tp21_bloom_decontaminate")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    // exact restatement with no bloom stage
    val docs = Tables.t(spark, d, "documents")
    def g5(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
      .filter(size(col("ws")) >= 5)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(ws) - 4),
           i -> concat_ws(' ', ws[i-1], ws[i], ws[i+1], ws[i+2], ws[i+3]))""")).as("gram"))
      .distinct()
    val bg = g5(docs.filter(col("doc_id") % 17 === 3)).select("gram")
    val cont = g5(docs.filter(col("doc_id") % 17 =!= 3))
      .join(bg, Seq("gram"), "left_semi").select("doc_id").distinct()
      .withColumn("hit", lit(1))
    val want = docs.filter(col("doc_id") % 17 =!= 3).select("doc_id", "lang")
      .join(cont, Seq("doc_id"), "left")
      .groupBy("lang").agg(count(lit(1)).as("n_docs"), count(col("hit")).as("n_contaminated"))
      .orderBy("lang")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    assert(got == want)
    // and the fixture corpus is non-trivial: some contamination exists
    assert(got.map(_._3).sum > 0, "expected planted dup spans to contaminate at least one doc")
  }

  test("count-min estimates are one-sided: est >= exact for every probed key") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.queries.Extended60.queries("a26_cms_freq")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 10)
    rows.foreach { case (k, exact, est) =>
      assert(est >= exact, s"CMS underestimated key $k: est=$est exact=$exact")
    }
  }

  test("streaming redelivery dedup suppresses the whole second wave") {
    val d = "/root/testdata/sf0.001"
    val got = graft.queries.Extended60.queries("st12_stream_dedup")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    val want = Tables.t(spark, d, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    assert(got == want)
  }
}
