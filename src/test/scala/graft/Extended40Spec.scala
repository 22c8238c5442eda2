package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Batch-40 operators against independent local recomputations. */
class Extended40Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  test("tp13 counts a planted shared 5-gram span, not unique text") {
    import spark.implicits._
    // docs 1 and 2 share one exact 5-word phrase at different offsets;
    // doc 3 is fully unique; doc 4 is too short to have any 5-gram
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon unique1 unique2"),
      (2L, "prefix alpha beta gamma delta epsilon suffix"),
      (3L, "one two three four five six"),
      (4L, "too short")
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("spec_docs")
    val n = 5
    val w = docs.select(col("doc_id"), split(col("text"), " ").as("words"))
      .filter(size(col("words")) >= n)
    val g = w.select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(words) - $n), " +
          s"i -> concat_ws(' ', slice(words, i + 1, $n)))"))
        .as(Seq("pos", "gram")))
    val dup = g.groupBy("gram").agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select(col("gram"), lit(1L).as("isdup"))
    val out = g.join(dup, Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("total"), sum(coalesce(col("isdup"), lit(0L))).as("dups"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1: 3 positions, exactly 1 (the shared phrase) duplicated
    assert(out(1L) == (3L, 1L))
    // doc 2: 3 positions, 1 duplicated
    assert(out(2L) == (3L, 1L))
    // doc 3: 2 positions, none duplicated
    assert(out(3L) == (2L, 0L))
    // doc 4 excluded entirely (< 5 words)
    assert(!out.contains(4L))
  }

  test("tp14 scores equal a local recomputation and are hash-deterministic") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y")).toDF("doc_id", "text")
    def localScore(text: String): (Long, Long) = {
      val words = text.split(" ")
      val iws = words.sliding(2).map(_.mkString(" ")).map { gram =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(gram.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(md5.take(8), 16) % 2001L - 1000L
      }.toSeq
      (iws.length.toLong, iws.sum)
    }
    val w = docs.select(col("doc_id"), split(col("text"), " ").as("words"))
      .filter(size(col("words")) >= 2)
    val g = w.select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(words) - 2), " +
          "i -> concat(words[i], ' ', words[i + 1]))")).as("gram"))
    val iw = conv(substring(md5(col("gram")), 1, 8), 16, 10)
      .cast("long") % 2001L - 1000L
    val out = g.select(col("doc_id"), iw.as("iw")).groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sum("iw").as("siw"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    Seq(1L -> "a b c", 2L -> "a b c", 3L -> "x y").foreach { case (id, txt) =>
      assert(out(id) == localScore(txt), s"doc $id")
    }
    // identical docs get identical scores (pure function of content)
    assert(out(1L) == out(2L))
  }

  test("sq8TopK matches brute-force top-k exactly on the test corpus") {
    val e = Tables.t(spark, d, "embeddings")
    val qv = e.filter(col("vec_id") === 0).select(col("embedding"))
      .head.getSeq[Float](0).map(_.toDouble)
    val corpus = e.filter(col("vec_id") =!= 0)
    val sq = Similarity.sq8TopK(corpus, "vec_id", "embedding", qv, 10, refine = 50)
      .collect().map(_.getLong(0)).toSeq
    val brute = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", qv, 10)
      .collect().map(_.getLong(0)).toSeq
    // SQ8 at 50-candidate refine recovers the exact brute-force top-10 on
    // this corpus (recall certified, not assumed)
    assert(sq == brute)
  }

  test("sq8 grid handles constant dimensions and out-of-grid queries") {
    import spark.implicits._
    // dim 0 informative, dim 1 CONSTANT (span = 0 → code 0 everywhere)
    val emb = Seq(
      (1L, Seq(0.0f, 5.0f)), (2L, Seq(0.5f, 5.0f)), (3L, Seq(1.0f, 5.0f))
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val idx = Similarity.buildSq8Index(emb, "embedding")
    assert(idx.mins.toSeq == Seq(0.0, 5.0) && idx.maxs.toSeq == Seq(1.0, 5.0))
    // query far outside the grid on both dims: codes clamp, no nulls, and
    // the nearest-by-value vector still wins
    val out = Similarity.sq8TopKWith(idx, emb, "vec_id", "embedding",
      Seq(9.9, -3.0), 1, refine = 3).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 3L) // closest to x=9.9 on the live dim
  }
}
