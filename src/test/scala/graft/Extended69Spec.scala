package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-69 operators: CDC apply and source-overlap matrix. */
class Extended69Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("u8 keeps exactly the last non-delete op per surviving key") {
    val got = graft.queries.Extended69.queries("u8_cdc_apply")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList
    assert(got.map(_._1) == got.map(_._1).sorted)
    assert(got.map(_._1).distinct.size == got.size)

    val ops = Tables.t(spark, d, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("seq"), col("event_id"),
        substring(md5(col("event_id").cast("string").cast("binary")), 1, 1)
          .isin("0", "1").as("del"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getLong(4)))
    val want = ops.groupBy(_._1).toList.flatMap { case (key, rows) =>
      val last = rows.maxBy(r => (r._2, r._3))
      if (last._4) None else Some((key, last._2, last._3, last._5))
    }.sortBy(_._1)
    assert(got == want)
    // the op mix contains real deletes (whether a key vanishes depends
    // on whether its LAST op is one — guaranteed only at larger sf)
    assert(ops.exists(_._4))
    assert(got.size <= ops.map(_._1).distinct.length)
  }

  test("t26 matrix is the exact vocab Jaccard and is symmetric-complete") {
    val got = graft.queries.Extended69.queries("t26_source_overlap")(spark, d)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap

    val ws = Tables.t(spark, d, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .collect().map(r => (r.getString(0), r.getString(1))).distinct
    val bySource = ws.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sources = bySource.keys.toList.sorted
    val wantPairs = for (a <- sources; b <- sources if a < b) yield (a, b)
    assert(got.keySet == wantPairs.toSet)
    for ((a, b) <- wantPairs) {
      val inter = (bySource(a) & bySource(b)).size.toLong
      val uni = (bySource(a) | bySource(b)).size.toLong
      val (c, j) = got((a, b))
      assert(c == inter, s"$a-$b")
      assert(j == inter.toDouble / uni.toDouble, s"$a-$b")
    }
  }
}
