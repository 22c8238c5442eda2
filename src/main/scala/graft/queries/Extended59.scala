package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream

/** Round-7 surface extensions, batch 59: the stream-stream FULL OUTER
  * interval join, replayed to completion — completes the streaming
  * join-mode family under the oracle gate (st2 inner, st8 left outer,
  * st11 full outer). Wave count is load-bearing exactly as in st8: the
  * far-future sentinel pair arrives as a LATER file than the event log,
  * so both sides' unmatched state is held across micro-batches and
  * released by the watermark — the cross-batch outer-state handoff is
  * what the replay certifies. Unmatched purchases emit null-click rows,
  * unmatched clicks collapse into the (user, null-purchase) group; the
  * oracle is the batch FULL JOIN restated over the same band.
  *
  * Plus a25: exact median of per-customer TOTAL SPEND per market
  * segment — the UNBOUNDED-domain member of the exact-median family.
  * Unlike a19/a22 (cent-scaled measures, domain fixed by the price
  * range), per-customer sums grow without bound as customers accrue
  * orders, so this query runs the fully DISTRIBUTED two-level selection
  * ([[graft.operators.Selection.lowerMedian]]: bucket partial sums →
  * bucket-summary window → one-bucket window, per-reducer rows
  * ~2·√domain) rather than the bounded-collect fast path — putting the
  * distributed path under the DuckDB oracle gate, not just its spec.
  */
object Extended59 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "a25_median_customer_spend" -> ((s, d) => {
      val c = graft.Tables.t(s, d, "orders")
        .join(broadcast(graft.Tables.t(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"), col("o_custkey").as("cust"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("mc"))
      val cnt = c.groupBy("seg", "mc").agg(count(lit(1)).as("n"))
      graft.operators.Selection.lowerMedian(cnt, Seq("seg"), "mc", "n",
          "median_spend_cents", bucketWidth = 1048576.0)
        .orderBy("seg")
    }),

    "st11_stream_full_join" -> ((s, d) => {
      val dir = Extended30.stagedOuterDir(s, d)
      val schema = graft.streaming.EventStream.cachedSchema(s, dir)
      val stream = EventStream.normalize(s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir))
      val j = EventStream.funnelFullJoin(stream)
      Extended18.runToCompletion(s, j, "st11_mem", OutputMode.Append(),
        partitions = 4)
        .filter(col("user_id") =!= 9999999L)
        .groupBy("user_id", "purchase_id")
        .agg(count(col("click_id")).as("n_clicks"),
          min(col("c_ts")).as("first_click"))
        .orderBy("user_id", "purchase_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "a25_median_customer_spend" ->
      """WITH c AS (
           SELECT cu.c_mktsegment AS seg, o.o_custkey,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS mc
           FROM orders o JOIN customer cu ON o.o_custkey = cu.c_custkey
           GROUP BY 1, 2),
         cnt AS (SELECT seg, mc, count(*) AS n FROM c GROUP BY 1, 2)
         SELECT seg, min(mc) AS median_spend_cents FROM (
           SELECT seg, mc,
             sum(n) OVER (PARTITION BY seg ORDER BY mc) AS cw,
             sum(n) OVER (PARTITION BY seg) AS tw
           FROM cnt)
         WHERE 2 * cw >= tw GROUP BY seg ORDER BY seg""",
    "st11_stream_full_join" ->
      """WITH b AS (SELECT user_id, event_id AS purchase_id, ts AS b_ts
                    FROM events WHERE event_type = 'purchase'),
            c AS (SELECT user_id, event_id AS click_id, ts AS c_ts
                  FROM events WHERE event_type = 'click'),
            j AS (
              SELECT coalesce(b.user_id, c.user_id) AS user_id,
                     b.purchase_id, c.click_id, c.c_ts
              FROM b FULL JOIN c
                ON b.user_id = c.user_id
                AND c.c_ts <= b.b_ts
                AND c.c_ts >= b.b_ts - INTERVAL 30 MINUTE)
         SELECT user_id, purchase_id,
           count(click_id) AS n_clicks, min(c_ts) AS first_click
         FROM j GROUP BY user_id, purchase_id
         ORDER BY user_id, purchase_id"""
  )
}
