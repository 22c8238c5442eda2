package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Batch-67: transformWithState (state v2) running totals. */
class Extended67Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("st13 equals the batch cumulative restatement across the wave boundary") {
    val got = graft.queries.Extended67
      .queries("st13_stream_running_totals")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList

    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val want = Tables.t(spark, d, "events")
      .select(col("user_id"), col("event_id"),
        row_number().over(w).cast("long").as("n"),
        sum(round(col("value") * 100).cast("long")).over(w).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList.sortBy(t => (t._1, t._3))
    assert(got == want)
    // multi-user, multi-event: the cross-batch handoff actually fired
    assert(got.map(_._1).distinct.size > 1)
    assert(got.groupBy(_._1).values.exists(_.size > 3))
  }

  test("st13 restores the state-store provider setting afterwards") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    graft.queries.Extended67.queries("st13_stream_running_totals")(spark, d)
      .collect()
    assert(spark.conf.getOption(key) == before)
  }
}
