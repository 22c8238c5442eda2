package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-35: the streaming transition matrix equals its batch twin at
  * sf0.001 (DuckDB hash gate at sf0.01 via Verify/oracle_check), with the
  * two-wave replay forcing cross-batch state handoff.
  */
class Extended35Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  test("st9 streaming transition matrix == batch e22") {
    val st = graft.queries.Extended35.queries("st9_stream_transition")(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val batch = graft.queries.Extended32.queries("e22_transition_matrix")(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(st == batch)
    assert(st.nonEmpty)
    // cross-batch proof: at least one user's boundary-spanning pair exists
    // (the wave split cuts the global ts order in half, so any user with
    // events on both sides chains through state) — verify such users exist
    val ev = Tables.t(spark, d, "events")
      .select(col("user_id"), col("ts").cast("long").as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ordered = ev.sortBy(e => (e._2, e._3))
    val half = ordered.length / 2
    val firstHalf = ordered.take(half).map(_._1).toSet
    val secondHalf = ordered.drop(half).map(_._1).toSet
    assert((firstHalf & secondHalf).nonEmpty,
      "fixture must exercise cross-batch state")
  }
}
