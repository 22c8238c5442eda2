package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-85: streaming as-of enrichment pinned row-for-row to the batch
  * IGNORE-NULLS window restatement, plus a hand-built cross-batch case.
  */
class Extended85Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("st14 equals the batch point-in-time lookup row-for-row") {
    val got = graft.queries.Extended85.queries("st14_stream_asof_enrich")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toList

    // batch restatement: per user, ordered by (us, event_id), carry the
    // last view (us, mv) forward; emit purchases
    val rows = graft.Tables.t(spark, d, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("us"), col("event_type"),
        round(col("value") * 1000).cast("long").as("mv"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4)))
    val want = rows.groupBy(_._1).toSeq.flatMap { case (uid, es) =>
      var last: Option[(Long, Long)] = None
      es.sortBy(e => (e._3, e._2)).flatMap { case (_, eid, us, typ, mv) =>
        if (typ == "view") { last = Some((us, mv)); None }
        else Some((uid, eid, us, last.map(_._1), last.map(_._2)))
      }
    }.sortBy(t => (t._1, t._2)).toList
    assert(got == want)
    // both enriched and never-viewed purchases must occur at sf0.001
    assert(got.exists(_._4.isDefined) && got.exists(_._4.isEmpty))
  }
}
