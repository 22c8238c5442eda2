package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-86: Poisson bootstrap + incremental aggregate maintenance,
  * pinned to a local replay of the weight stream and a recount.
  */
class Extended86Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  private val Cdf = Seq(0.36787944117144233, 0.7357588823428847,
    0.9196986029286058, 0.9810118431238463, 0.9963401531726563,
    0.9994058151824183)

  private def weight(eventId: Long, b: Int): Long = {
    val z = graft.functions.Hashing.splitmix64(eventId * 41L + b)
    val u = (z >>> 11).toDouble / 9007199254740992.0
    val k = Cdf.indexWhere(u < _)
    if (k < 0) 6L else k.toLong
  }

  test("a41 replicate means and rank CI match a local weight-stream replay") {
    val got = graft.queries.Extended86.queries("a41_poisson_bootstrap")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toList
    assert(got.nonEmpty)
    val rows = graft.Tables.t(spark, d, "events")
      .select(col("event_id"), col("event_type"),
        round(col("value") * 1000).cast("long").as("mv"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (et, n, mean, lo, hi) =>
      val es = rows.filter(_._2 == et)
      assert(n == es.length.toLong)
      assert(mean == r6(es.map(_._3).sum.toDouble / n / 1000.0))
      val ms = (0 until 40).map { b =>
        val (s0, w0) = es.foldLeft((0L, 0L)) { case ((sa, wa), (eid, _, mv)) =>
          val w = weight(eid, b); (sa + w * mv, wa + w)
        }
        s0.toDouble / w0.toDouble / 1000.0
      }.sorted
      assert(lo == r6(ms(1)), s"type=$et lo")
      assert(hi == r6(ms(38)), s"type=$et hi")
      assert(lo <= hi && lo <= mean + 1.0 && hi >= mean - 1.0)
    }
  }

  test("u9 merged partial aggregates equal the from-scratch view") {
    val got = graft.queries.Extended86.queries("u9_incremental_agg")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList
    val want = graft.Tables.t(spark, d, "events")
      .select(col("event_type"), dayofmonth(col("ts")).cast("long").as("day"),
        round(col("value") * 1000).cast("long").as("mv"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"), sum("mv").as("s"))
      .orderBy("event_type", "day")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList
    assert(got == want)
    // both sides of the split must be represented
    assert(got.exists(_._2 < 24) && got.exists(_._2 >= 24))
  }
}
