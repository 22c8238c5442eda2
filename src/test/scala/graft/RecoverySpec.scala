package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Exactly-once across restarts: a streaming aggregation driven in two
  * parts through the same checkpoint must equal the one-shot batch result —
  * no lost and no double-counted events at the restart boundary.
  */
class RecoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming agg restarted from its checkpoint equals the batch result") {
    val src = java.nio.file.Files.createTempDirectory("graft-recover-src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-recover-ckpt").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001").cache()

    // split the fixture into two arrival waves on event_id parity —
    // deterministic and disjoint. The file source lists plain files, so
    // each wave is staged as a single flat parquet file in the source dir.
    val w1 = events.filter(col("event_id") % 2 === 0)
    val w2 = events.filter(col("event_id") % 2 === 1)
    assert(w1.count() > 0 && w2.count() > 0 && w1.count() + w2.count() == events.count())
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      TestSpark.stageSingleParquet(df, src, name)
    stage(w1, "wave1.parquet")

    def startQuery() = {
      val stream = spark.readStream
        .schema(w1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src.toString)
      stream.groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt)
        .format("memory").queryName("recover_out").start()
    }

    // wave 1, then a clean stop
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    val mid = spark.table("recover_out").agg(sum("n")).head.getLong(0)
    assert(mid == w1.count(), "first run must account exactly for wave 1")

    // wave 2 lands while the query is down; restart from the checkpoint
    stage(w2, "wave2.parquet")
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.table("recover_out").orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val batch = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == batch.length)
    // counts must be exactly-once; sums can differ only in float fold order
    got.zip(batch).foreach { case ((t1, n1, s1), (t2, n2, s2)) =>
      assert(t1 == t2 && n1 == n2, s"$t1: $n1 vs $n2")
      assert(math.abs(s1 - s2) <= 0.011, s"$t1: $s1 vs $s2")
    }
    events.unpersist()
  }
}
