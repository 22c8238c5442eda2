package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** The streaming operators against a source that NEVER ENDS — Spark's
  * rate source with a processing-time trigger — instead of the staged
  * replays the st* oracles use (Trigger.AvailableNow over pinned files).
  * Proves two things the replays cannot:
  *
  *  1. the same pipeline runs unbounded: micro-batches fire on the clock,
  *     the query is stopped mid-flight (a KILL, not a drained shutdown);
  *  2. checkpoint recovery is exactly-once across that kill: the restart
  *     resumes from committed offsets and the final aggregate equals the
  *     batch restatement over exactly the rows the source emitted.
  *
  * Every event field derives from the rate source's monotonic `value`
  * (never from wall-clock), so the processed prefix 0..M−1 is fully
  * reproducible with spark.range(M) and the comparison is exact — the
  * per-group doubles are small integers, so no float-fold-order hazard.
  */
class UnboundedStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Deterministic event synthesis from the monotonic counter. */
  private def synth(df: DataFrame): DataFrame =
    df.select(
      timestamp_micros(lit(1700000000000000L) + col("value") * 60000000L).as("ts"),
      concat(lit("t"), (col("value") % 3).cast("string")).as("event_type"),
      (col("value") % 7).cast("double").as("value"))

  private def batchRestatement(m: Long): Seq[(Long, String, Long, Double)] =
    synth(spark.range(m).select(col("id").as("value")))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(unix_timestamp(col("window.start")).as("hour_ts"),
        col("event_type"), col("n"), col("total"))
      .orderBy("hour_ts", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq

  private def sinkRows(): Seq[(Long, String, Long, Double)] =
    spark.table("rate_out").orderBy("hour_ts", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq

  private def rowsSeen(): Long = {
    val agg = spark.table("rate_out").agg(coalesce(sum("n"), lit(0L))).head
    agg.getLong(0)
  }

  test("hourlyAgg from the rate source: kill mid-flight, restart exactly-once from the checkpoint") {
    val ckpt = Files.createTempDirectory("graft-rate-ckpt").toString
    def start() = {
      val rate = spark.readStream.format("rate")
        .option("rowsPerSecond", "5000").load()
      EventStream.hourlyAgg(synth(rate))
        .writeStream.outputMode("complete")
        .format("memory").queryName("rate_out")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime("100 milliseconds"))
        .start()
    }

    // run 1: let a few clock-driven batches commit, then KILL (no drain)
    val q1 = start()
    val deadline1 = System.nanoTime + 90L * 1000000000L
    while ((q1.recentProgress.count(_.numInputRows > 0) < 3 || rowsSeen() == 0)
        && System.nanoTime < deadline1 && q1.isActive)
      Thread.sleep(100)
    q1.stop()
    val m1 = rowsSeen()
    assert(m1 > 0, "rate source committed no rows within the deadline")
    // the committed prefix is contiguous 0..m1-1: the complete-mode sink
    // reflects the last committed batch, and rate emits values in order
    assert(sinkRows() == batchRestatement(m1),
      s"streamed aggregate over $m1 rows diverged from the batch restatement")

    // run 2: restart from the checkpoint; the source resumes/catches up
    // past the kill point — committed rows must never double-count
    val q2 = start()
    val deadline2 = System.nanoTime + 90L * 1000000000L
    while ((q2.recentProgress.count(_.numInputRows > 0) < 2 || rowsSeen() <= m1)
        && System.nanoTime < deadline2 && q2.isActive)
      Thread.sleep(100)
    q2.stop()
    val m2 = rowsSeen()
    assert(m2 > m1, s"restart committed nothing new (m1=$m1, m2=$m2)")
    assert(sinkRows() == batchRestatement(m2),
      s"post-restart aggregate over $m2 rows diverged — lost or double-counted " +
        "rows at the kill/restart boundary")
  }
}
