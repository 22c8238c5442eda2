package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.MergeInto

/** Batch-27 operators against independent local recomputations. */
class Extended27Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def tinyMerge() = {
    import spark.implicits._
    val tgt = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("id", "name", "bal")
    // 1: delete; 2: update; 5: insert; 3/4 untouched (4 has no src row)
    val src = Seq((1L, "delete", 0.0), (2L, "update", 5.0),
      (3L, "noop", 0.0), (5L, "insert", 50.0)).toDF("k", "op", "v")
    (tgt, src)
  }

  test("MergeInto applies delete, update, insert and passthrough in one pass") {
    val (tgt, src) = tinyMerge()
    val out = MergeInto(tgt, src, "id", "k",
      deleteWhen = Some(col("op") === "delete"),
      updateSet = Map("bal" -> when(col("op") === "update",
        col("bal") + col("v")).otherwise(col("bal"))),
      insertValues = Map("id" -> col("k"),
        "name" -> lit("new"), "bal" -> col("v")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set((2L, "b", 25.0), (3L, "c", 30.0), (4L, "d", 40.0),
      (5L, "new", 50.0)))
  }

  test("MergeInto without an insert clause discards source-only rows") {
    val (tgt, src) = tinyMerge()
    val out = MergeInto(tgt, src, "id", "k",
      deleteWhen = Some(col("op") === "delete"))
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(2L, 3L, 4L)) // 1 deleted, 5 never inserted
  }

  test("MergeInto rejects overlapping column names") {
    import spark.implicits._
    val tgt = Seq((1L, 1.0)).toDF("id", "v")
    val src = Seq((1L, 2.0)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      MergeInto(tgt, src, "id", "k")
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("tp9 weighted sample equals the local Efraimidis-Spirakis top-100") {
    val got = graft.queries.Extended27.queries("tp9_weighted_sample")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val docs = Tables.t(spark, d, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter(_._2 > 0)
    val md = java.security.MessageDigest.getInstance("MD5")
    def hv(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16)
    }
    val want = docs
      .map { case (id, w) =>
        (id, w, math.log((hv(id).toDouble + 1.0) / 4294967296.0) / w) }
      .sortBy { case (id, _, key) => (-key, id) }
      .take(100).map { case (id, w, _) => (id, w) }
    assert(got.sameElements(want))
  }

  test("st7 late-drop replay equals the batch watermark-arithmetic twin") {
    val got = graft.queries.Extended27.queries("st7_late_drop")(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val ev = Tables.events(spark, d)
      .select(col("event_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("us"))
    val wmMs = ev.filter(col("event_id") % 2 === 0)
      .agg(max(col("us"))).head.getLong(0) / 1000L - 7200000L
    val tipId = ev.filter(col("event_id") % 2 === 1)
      .orderBy(col("us").desc, col("event_id").desc)
      .head.getLong(0)
    val want = ev
      .filter(col("event_id") % 2 === 0 || col("event_id") === tipId ||
        (expr("us div 3600000000") + 1) * 3600000L > wmMs)
      .groupBy((expr("us div 3600000000") * 3600).as("hour_ts"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .orderBy("hour_ts", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // the replay must actually drop something (otherwise this tests nothing)
    val full = Tables.events(spark, d).count()
    assert(got.map(_._3).sum < full)
    assert(got.sameElements(want))
  }
}
