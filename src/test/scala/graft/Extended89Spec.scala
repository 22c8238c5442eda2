package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-89: conversion-lag quantiles + dedup token accounting, pinned to
  * local brute force.
  */
class Extended89Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("e32 quantiles equal the brute-force next-purchase lag distribution") {
    val got = graft.queries.Extended89.queries("e32_conversion_lag_quantiles")(spark, d)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toList
    assert(got.map(_._1) == List(0.5, 0.9, 0.99))

    val ev = graft.Tables.t(spark, d, "events")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("us"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val buysByUser = ev.filter(_._4 == "purchase").groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._3).sorted }
    val lags = ev.filter(_._4 == "click").flatMap { case (u, _, cus, _) =>
      buysByUser.get(u).flatMap(_.find(_ >= cus)).map(p => (p - cus) / 1000000L)
    }.sorted
    assert(got.head._2 == lags.length.toLong)
    Seq(0.5, 0.9, 0.99).zip(got).foreach { case (q, (_, _, gap)) =>
      val want = lags(math.ceil(q * lags.length).toInt - 1)
      assert(gap == want, s"q=$q got=$gap want=$want")
    }
  }

  test("t29 per-source accounting conserves docs and tokens against the keep set") {
    val got = graft.queries.Extended89.queries("t29_dedup_token_impact")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toList
    val docs = graft.Tables.t(spark, d, "documents")
    assert(got.map(_._2).sum == docs.count())
    // removed counts must equal the production keep-set complement
    val keep = graft.llm.Dedup.dedupNear(docs, "doc_id", "text", 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bySource = docs.select(col("doc_id"), col("source"),
        graft.llm.Text.tokenCount(col("text")).cast("long").as("nt"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._2)
    got.foreach { case (src, nDocs, tokens, nRem, tokRem, share) =>
      val rows = bySource(src)
      assert(nDocs == rows.length.toLong)
      assert(tokens == rows.map(_._3).sum)
      assert(nRem == rows.count(r => !keep(r._1)).toLong, s"src=$src")
      assert(tokRem == rows.filter(r => !keep(r._1)).map(_._3).sum, s"src=$src")
      assert(share == BigDecimal(tokRem.toDouble / tokens)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // the planted near-dups guarantee at least one removal somewhere
    assert(got.map(_._4).sum > 0)
  }
}
