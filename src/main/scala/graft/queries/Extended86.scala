package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-7 batch 86: one-pass Poisson bootstrap confidence intervals, and
  * incremental (merge, don't recompute) aggregate-view maintenance.
  *
  *  - a41_poisson_bootstrap: the bootstrap CI of the mean event value per
  *    type, done the way it is done at corpus scale — the POISSON
  *    bootstrap: every row contributes an independent Poisson(1) count
  *    to each of B=40 replicates, so all 40 resampled (Σw·x, Σw) pairs
  *    come out of ONE aggregate pass over ONE scan (80 sum columns — no
  *    explode, no 40× data, no sampling shuffle; the classic "n out of
  *    n" bootstrap cannot even be expressed distributively). Weights are
  *    deterministic: u = top-53 bits of splitmix64(event_id·41 + b)
  *    (exactly representable as a double, identical in both engines)
  *    inverted through the Poisson(1) CDF thresholds embedded as shared
  *    literals. Replicate sums are exact BIGINTs (milli-values); each
  *    mean is one division; the CI is the 2nd-smallest / 2nd-largest of
  *    the 40 replicate means (a two-sided 5% rank rule, selected by
  *    sorting the 40-element array — deterministic on bit-identical
  *    doubles).
  *  - u9_incremental_agg: the (type, day) count/value view refreshed
  *    INCREMENTALLY — base partition (days < 24) aggregated once, the
  *    daily delta aggregated alone, and the view updated by merging the
  *    two partial aggregates (union → re-sum), never rescanning the
  *    base. Counts and milli-sums are the mergeable-aggregate contract;
  *    the oracle computes the view from scratch, so the hash match IS
  *    the incremental-equals-full proof.
  *
  * Scale shape: a41 is one scan → one hash agg with 80 partial-combined
  * sums per type; u9 touches the delta partition plus the (type, day)
  * summary — the 100 TB refresh never re-reads the base.
  *
  * Reference context: no counterpart; a41 extends the evaluation layer
  * with uncertainty quantification (the judge of a16/a39's point
  * estimates), u9 extends the maintenance family (u5 MERGE, u8 CDC).
  */
object Extended86 {
  type Q = (SparkSession, String) => DataFrame

  private val B = 40
  /** Poisson(1) CDF thresholds P(X ≤ k), k = 0..5; weights cap at 6. */
  private val Cdf = Seq(
    "0.36787944117144233", "0.7357588823428847", "0.9196986029286058",
    "0.9810118431238463", "0.9963401531726563", "0.9994058151824183")

  private def sm(c: Column) = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.SplitMix64(ColumnBridge.expression(c.cast("long"))))
  }

  /** Poisson(1) weight of replicate `b` for the current row: invert the
    * CDF at u = top-53 bits of the stream value (an exact double).
    */
  private def weight(b: Int): Column = {
    val u = shiftrightunsigned(sm(col("event_id") * lit(B.toLong + 1) + lit(b.toLong)), 11)
      .cast("double") / lit(9007199254740992.0)
    Cdf.zipWithIndex.foldRight(lit(6L)) { case ((t0, k), rest) =>
      when(u < lit(t0.toDouble), lit(k.toLong)).otherwise(rest)
    }
  }

  val queries: Map[String, Q] = Map(
    "a41_poisson_bootstrap" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_id"), col("event_type"),
          round(col("value") * 1000).cast("long").as("mv"))
      val aggs: Seq[Column] =
        Seq(count(lit(1)).as("n"), sum("mv").as("mv_sum")) ++
          (0 until B).flatMap { b =>
            val w = weight(b)
            Seq(sum(w * col("mv")).as(s"s$b"), sum(w).as(s"w$b"))
          }
      val g = ev.groupBy("event_type").agg(aggs.head, aggs.tail: _*)
      val means = array((0 until B).map(b =>
        col(s"s$b").cast("double") / col(s"w$b").cast("double") / 1000.0): _*)
      g.select(col("event_type"), col("n"),
          round(col("mv_sum").cast("double") / col("n").cast("double") / 1000.0, 6)
            .as("mean_value"),
          sort_array(means).as("ms"))
        .select(col("event_type"), col("n"), col("mean_value"),
          round(element_at(col("ms"), 2), 6).as("ci_lo"),
          round(element_at(col("ms"), B - 1), 6).as("ci_hi"))
        .orderBy("event_type")
    }),

    "u9_incremental_agg" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_type"), dayofmonth(col("ts")).cast("long").as("day"),
          round(col("value") * 1000).cast("long").as("mv"))
      def partial(df: DataFrame): DataFrame =
        df.groupBy("event_type", "day")
          .agg(count(lit(1)).as("n"), sum("mv").as("mv_sum"))
      val base = partial(ev.filter(col("day") < 24))
      val delta = partial(ev.filter(col("day") >= 24))
      // the refresh: merge partial aggregates — sums of counts and sums
      base.unionAll(delta)
        .groupBy("event_type", "day")
        .agg(sum("n").as("n"), sum("mv_sum").as("mv_sum"))
        .orderBy("event_type", "day")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "a41_poisson_bootstrap" -> {
      def w(b: Int): String = {
        val seeds = s"[(event_id*${B + 1} + $b)::HUGEINT]"
        val u = s"(CAST(${OracleSql.splitmixList(seeds)}[1] // 2048 AS DOUBLE)" +
          s" / 9007199254740992.0)"
        Cdf.zipWithIndex.foldRight("6::BIGINT") { case ((t0, k), rest) =>
          s"(CASE WHEN $u < $t0 THEN $k ELSE $rest END)"
        }
      }
      val sums = (0 until B).map { b =>
        s"CAST(sum(${w(b)} * mv) AS BIGINT) AS s$b, CAST(sum(${w(b)}) AS BIGINT) AS w$b"
      }.mkString(",\n             ")
      val means = (0 until B).map(b =>
        s"CAST(s$b AS DOUBLE) / CAST(w$b AS DOUBLE) / 1000.0").mkString(", ")
      s"""WITH e AS (
           SELECT event_id, event_type,
             CAST(round(value * 1000) AS BIGINT) AS mv
           FROM events),
         g AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(mv) AS BIGINT) AS mv_sum,
             $sums
           FROM e GROUP BY event_type),
         m AS (
           SELECT event_type, n,
             round(CAST(mv_sum AS DOUBLE) / CAST(n AS DOUBLE) / 1000.0, 6)
               AS mean_value,
             list_sort([$means]) AS ms
           FROM g)
         SELECT event_type, n, mean_value,
           round(ms[2], 6) AS ci_lo, round(ms[${B - 1}], 6) AS ci_hi
         FROM m ORDER BY event_type"""
    },
    "u9_incremental_agg" ->
      """WITH e AS (
           SELECT event_type,
             CAST(extract(day FROM ts) AS BIGINT) AS day,
             CAST(round(value * 1000) AS BIGINT) AS mv
           FROM events)
         SELECT event_type, day, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(mv) AS BIGINT) AS mv_sum
         FROM e GROUP BY event_type, day
         ORDER BY event_type, day"""
  )
}
