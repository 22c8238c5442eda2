package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spatial.ZOrder

/** Semantic invariants for the fourth extension batch. */
class Extended4Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"
  def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Plain-Scala Morton reference for parity with the expression tree. */
  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("ZOrder.interleave matches the scalar reference over the full 8-bit grid edge") {
    import spark.implicits._
    // full axes plus a pseudo-random interior sample
    val rnd = new scala.util.Random(7)
    val pts = (0L until 256L).map(v => (v, 255L - v)) ++
      Seq.fill(200)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.interleave(col("x"), col("y"), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) => assert(z == mortonRef(x, y, 8), s"($x,$y)") }
    // bijectivity on the sampled set: distinct inputs -> distinct codes
    assert(got.map(_._3).distinct.length == pts.distinct.length)
  }

  test("ZOrder locality: quadrant high bits are the interleaved axis high bits") {
    import spark.implicits._
    val pts = for (x <- 0L until 256L by 17; y <- 0L until 256L by 13) yield (x, y)
    val rows = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.interleave(col("x"), col("y"), 8).as("z"))
      .collect()
    rows.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      // top two code bits identify the 2x2 quadrant -> range scan prunes it
      assert((z >> 14) == (((y >> 7) & 1L) << 1 | ((x >> 7) & 1L)))
    }
  }

  test("j11 kNN join plans through GroupTopK and equals the window form") {
    val out = q("j11_knn_join")
    assert(out.queryExecution.executedPlan.toString.contains("GroupTopK"),
      "kNN join must plan through the custom bounded-heap operator")
    val e = Tables.t(spark, sf, "embeddings")
    val qv = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("qv"))
    val pairs = e.filter(col("vec_id") >= 20).crossJoin(broadcast(qv))
      .select(col("qid"), col("vec_id"),
        graft.llm.Similarity.cosine(col("embedding"), col("qv")).as("c"))
    val w = Window.partitionBy("qid").orderBy(col("c").desc, col("vec_id"))
    val want = pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("qid"), col("vec_id"), round(col("c"), 4).as("sim"))
      .orderBy(col("qid"), col("sim").desc, col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == want.length && got.sameElements(want))
  }

  test("t10 picks the true per-document argmax under (score desc, term asc)") {
    val docs = Tables.t(spark, sf, "documents")
    val n = docs.count()
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfq = toks.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfq, "term")
      .withColumn("score", (col("tf") * lit(n + 1)).cast("double") / (col("df") + 1))
    val best = scored.groupBy("doc_id").agg(max("score").as("mx"))
    // the query's winner must carry its document's maximum score
    val winners = q("t10_tfidf_top_term")
      .join(scored.select(col("doc_id"), col("term"), col("score")), Seq("doc_id", "term"))
      .join(best, "doc_id")
    assert(winners.filter(col("score") =!= col("mx")).isEmpty)
    assert(winners.count() == docs.count())
  }

  test("a12 approximate quantiles are exact discrete quantiles at this accuracy") {
    val out = q("a12_approx_quantile").collect()
    assert(out.nonEmpty)
    val groups = Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    out.foreach { r =>
      val vs = groups(r.getString(0))
      val (p50, p90, p99) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p50 <= p90 && p90 <= p99)
      // each answer is an actual element (GK never interpolates)
      Seq(p50, p90, p99).foreach(p => assert(vs.contains(p)))
      // and within one position of the exact discrete rank
      Seq(0.5 -> p50, 0.9 -> p90, 0.99 -> p99).foreach { case (frac, p) =>
        val rank = vs.indexOf(p)
        assert(math.abs(rank - frac * (vs.length - 1)) <= 1.0,
          s"${r.getString(0)} q$frac: rank $rank of ${vs.length}")
      }
    }
  }

  test("native session_window merges at exactly 30 min, splits just past it") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def plusMs(ms: Long) = new java.sql.Timestamp(t0.getTime + ms)
    val gap = 30L * 60000
    // an exactly-30-min gap still merges; 30 min + 1 ms opens a new session
    val df = Seq((1L, t0), (1L, plusMs(gap)), (1L, plusMs(2 * gap + 1)), (2L, t0))
      .toDF("user_id", "ts")
    val sess = df.groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("sw.start"), col("n"))
      .orderBy("user_id", "start").collect()
    assert(sess.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((1L, 2L), (1L, 1L), (2L, 1L)))
  }

  test("e12 cohort row at offset 0 counts every user of that cohort") {
    val out = q("e12_retention_cohort")
    val ev = Tables.events(spark, sf)
    val cohorts = ev
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
      .groupBy("user_id").agg(date_format(min("wk"), "yyyy-MM-dd").as("cohort_wk"))
      .groupBy("cohort_wk").agg(countDistinct("user_id").as("want"))
    val zero = out.filter(col("week_offset") === 0)
      .join(cohorts, "cohort_wk")
    assert(zero.filter(col("n_users") =!= col("want")).isEmpty)
    assert(zero.count() == cohorts.count())
  }
}
