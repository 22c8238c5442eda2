package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the ninth extension batch (chunking, repetition
  * signals, PII redaction, URL parsing, normalized pooling) plus a
  * count-min-sketch mergeability proof (the CMS analog of the HLL proof in
  * Extended6Spec — partial sketches from disjoint shards must merge to the
  * whole-corpus answer, the property that makes the sketch a valid
  * map-side-combine aggregate at 100 TB).
  */
class Extended9Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"
  def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("t12 chunks tile every token exactly: stride gaps covered, overlap = size - stride") {
    val chunks = q("t12_chunk_overlap")
      .groupBy("doc_id")
      .agg(sum("chunk_len").as("chunked"),
        count(lit(1)).as("n_chunks"),
        max("chunk_len").as("max_len"))
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"),
        expr("size(filter(split(text, ' '), w -> length(w) > 0))").as("n_tok"))
    val joined = chunks.join(docs, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (chunked, n, nTok) = (r.getAs[Long]("chunked"),
        r.getAs[Long]("n_chunks"), r.getAs[Int]("n_tok").toLong)
      assert(r.getAs[Long]("max_len") <= 50)
      // windows start every 40 tokens and are clamped at the end of the
      // doc, so the chunk inventory is fully determined by n_tok
      val starts = 0L until nTok by 40L
      assert(n == starts.length, s"doc ${r.get(0)}")
      assert(chunked == starts.map(st => math.min(50L, nTok - st)).sum,
        s"doc ${r.get(0)}")
      // the last window reaches the final token: nothing is dropped
      assert(starts.last + 50 >= nTok, s"doc ${r.get(0)}")
    }
  }

  test("t13 repetition signals rank a copy-paste doc above prose") {
    import spark.implicits._
    val df = Seq(
      (1L, Iterator.fill(30)("spam ham").mkString(" ")), // one bigram repeated
      (2L, (1 to 60).map(i => s"w$i").mkString(" "))      // all-distinct prose
    ).toDF("doc_id", "text")
    df.createOrReplaceTempView("t13_docs")
    // same pipeline as the query, against the planted docs
    val toks = "filter(split(text, ' '), w -> length(w) > 0)"
    val base = df.select(col("doc_id"), expr(toks).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tok"),
        size(array_distinct(col("toks"))).cast("long").as("n_uniq"))
      .withColumn("dup", lit(1.0) - col("n_uniq").cast("double") / col("n_tok"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(base(1L) > 0.9 && base(2L) == 0.0)
  }

  test("t14 redacted notes contain no residual PII and counts are consistent") {
    val out = q("t14_pii_redact").cache()
    try {
      assert(out.filter(col("redacted").rlike("[a-z0-9#]+@[a-z.]+")).isEmpty)
      assert(out.filter(col("redacted").rlike("\\+1-555-[0-9]{4}")).isEmpty)
      // every note embeds at least one email; second email iff rich account
      assert(out.filter(col("n_emails") < 1 || col("n_emails") > 2).isEmpty)
      val redactions = out.select(
        sum(col("n_emails")).as("e"), sum(col("n_phones")).as("p")).head
      assert(redactions.getLong(0) > 0 && redactions.getLong(1) > 0)
      // redacted text carries exactly n_emails [EMAIL] markers
      assert(out.filter(
        size(split(col("redacted"), "\\[EMAIL\\]", -1)) - 1 =!= col("n_emails"))
        .isEmpty)
    } finally out.unpersist()
  }

  test("q8 EXISTS aggregate equals the distinct-key join recount") {
    val orders = Tables.t(spark, sf, "orders")
      .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val li = Tables.t(spark, sf, "lineitem")
    val recount = orders.join(li,
        orders("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > orders("o_orderdate") + expr("INTERVAL 60 DAY"),
        "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n_late"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = q("q8_exists_late").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == recount && got.values.sum > 0)
  }

  test("s9 ORC round-trip equals the direct parquet aggregate") {
    val direct = Tables.t(spark, sf, "lineitem").groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").cast("long").as("sum_qty"),
        sum("l_linenumber").as("sum_ln"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val rt = q("s9_orc_roundtrip").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rt == direct)
  }

  test("v3 pooled centroids have norm <= 1 (convexity of unit vectors)") {
    val byLabel = q("v3_norm_pool").groupBy("label")
      .agg(sum(col("c") * col("c")).as("norm2")).collect()
    assert(byLabel.nonEmpty)
    // components are rounded to 6 dp before the norm: 64 dims × 5e-7
    // component error admits up to ~8e-6 excess at norm ≈ 1
    byLabel.foreach(r =>
      assert(r.getDouble(1) <= 1.0 + 1e-4 && r.getDouble(1) > 0.0))
  }

  test("f16 parsed URL components reassemble to the original URL") {
    val out = q("f16_url_battery")
      .withColumn("rebuilt", concat(lit("https://"), col("host"), col("path"),
        lit("?size="), col("qsize"), lit("&type="), col("qtype")))
    val parts = Tables.t(spark, sf, "part")
    // rebuild independently from the base table and compare set-equal
    val expected = parts.select(concat(
      lit("https://"), lower(regexp_replace(col("p_brand"), lit("#"), lit(""))),
      lit(".example.com/catalog/"), col("p_partkey"),
      lit("?size="), col("p_size"),
      lit("&type="), regexp_replace(col("p_type"), lit(" "), lit("+"))).as("url"))
    assert(out.select(col("rebuilt").as("url")).except(expected).isEmpty)
    assert(out.count() == parts.count())
  }

  test("count-min sketch: disjoint shard sketches merge to the full-corpus estimate") {
    val li = Tables.t(spark, sf, "lineitem").select("l_suppkey")
    val eps = 0.001; val conf = 0.99; val seed = 42
    val whole = li.stat.countMinSketch("l_suppkey", eps, conf, seed)
    val left = li.filter(col("l_suppkey") % 2 === 0)
      .stat.countMinSketch("l_suppkey", eps, conf, seed)
    val right = li.filter(col("l_suppkey") % 2 =!= 0)
      .stat.countMinSketch("l_suppkey", eps, conf, seed)
    left.mergeInPlace(right)
    val exact = li.groupBy("l_suppkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    exact.foreach { case (k, n) =>
      // CMS never undercounts, and merged == single-pass (same seed/width)
      assert(whole.estimateCount(k) >= n)
      assert(left.estimateCount(k) == whole.estimateCount(k), s"key $k")
    }
  }
}
