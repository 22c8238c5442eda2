package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-6 surface extensions, batch 46: integer-epoch domain
  * upsampling and boundary-based RFM segmentation.
  *
  *  - tp18: DOMAIN UPSAMPLING with integer epoch factors — the
  *    low-resource-domain balancing step of a training-data pipeline
  *    (the integer-epoch variant of tp12's α-temperature mixing; what
  *    DoReMi-style weights become once materialized): each source's
  *    epoch count is `min(4, ceil(max_tokens / tokens))` in EXACT
  *    integer arithmetic (`(mx + tok − 1) div tok`), and the corpus is
  *    physically replicated with `explode(sequence(1, epochs))`. The
  *    query counts the exploded rows (the real work — the oracle
  *    restates the closed form n_docs × epochs, so the explode path is
  *    verified against arithmetic, not against itself). Scale shape:
  *    the per-source stats are one partial agg; the explode is a
  *    map-side generator with no shuffle — at 100 TB the replication
  *    happens at shard-write time and this plan IS that write's input.
  *  - e24: RFM SEGMENTATION (recency / frequency / monetary quintiles)
  *    WITHOUT a global ntile: a partitionless `ntile(5)` over every
  *    customer is the textbook formulation and the textbook scale
  *    failure (one task sorts all customers). Instead: per dimension,
  *    aggregate to (value, count), then ONE two-level bounded selection
  *    (operators/Selection, all four ranks sharing its two passes —
  *    round 7: the former pass was a partitionless window over distinct
  *    values, row-proportional for the monetary dimension) picks the
  *    four boundary values where 5·cum ≥ k·total, broadcast the 12 numbers,
  *    and bucket every customer by comparison (`1 + Σ [x > bₖ]`) — all
  *    BIGINT comparisons, bit-identical cross-engine, no row ever
  *    sorted globally. Ties land in one bucket (boundary semantics,
  *    deliberately NOT ntile's split-the-tie semantics — documented
  *    here because the two differ on tied values).
  */
object Extended46 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- tp18: integer-epoch domain upsampling ----
    "tp18_domain_upsample" -> ((s, d) => {
      val stats = t(s, d, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("tok"))
      val mx = stats.agg(max("tok").as("mx"))
      val epochs = stats.crossJoin(broadcast(mx))
        .select(col("source"), col("n_docs"),
          least(lit(4L), expr("(mx + tok - 1) div tok")).as("epochs"))
      val up = t(s, d, "documents").join(broadcast(epochs), "source")
        .select(col("source"), explode(expr("sequence(1L, epochs)")).as("i"))
      up.groupBy("source").agg(count(lit(1)).as("n_rows"))
        .join(broadcast(epochs), "source")
        .select(col("source"), col("n_docs"), col("epochs"), col("n_rows"))
        .orderBy("source")
    }),

    // ---- e24: boundary-based RFM segmentation ----
    "e24_rfm_segments" -> ((s, d) => {
      import s.implicits._
      val c = t(s, d, "orders")
        .groupBy(col("o_custkey").as("cust"))
        .agg(expr("unix_timestamp(max(o_orderdate)) div 86400").as("r"),
          count(lit(1)).as("f"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("mc"))
        .localCheckpoint()
      // four quintile boundaries of one BIGINT dimension, as a 4-element
      // literal array. All four ranks share ONE two-level bounded
      // selection (operators/Selection): the old form's partitionless
      // cumulative window ran over ALL distinct values — row-proportional
      // for the monetary dimension (distinct per-customer sums ≈
      // customers) — while the bucket summaries collected here stay
      // domain/width-bounded at any sf. `5·cw ≥ k·tw` ⟺ cw ≥ ⌈k·tw/5⌉
      // for integral counts, so the boundary values are unchanged.
      def boundaries(valCol: String, width: Double): Column = {
        val cnt = c.groupBy(valCol).agg(count(lit(1)).as("n"))
        val rows = graft.operators.Selection.selectRanksBounded(
            cnt, Seq.empty, valCol, "n",
            (1 to 4).map(k => (k.toString, (tw: Long) => (k * tw + 4) / 5)),
            "k", "b", bucketWidth = width)
          .collect().map(r => (r.getString(0).toInt, r.getLong(1)))
          .sortBy(_._1)
        array(rows.map(kb => lit(kb._2)): _*)
      }
      def bucket(x: Column, bs: Column): Column =
        lit(1) + size(filter(bs, b => x > b))
      val q = c.select(col("mc"),
        (bucket(col("r"), boundaries("r", 4096.0)) * 100 +
          bucket(col("f"), boundaries("f", 4096.0)) * 10 +
          bucket(col("mc"), boundaries("mc", 131072.0))).as("segment"))
      q.groupBy("segment")
        .agg(count(lit(1)).as("n_customers"),
          sum("mc").as("sum_monetary_cents"))
        .orderBy("segment")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "tp18_domain_upsample" ->
      """WITH s AS (SELECT source, count(*) AS n_docs,
                  CAST(sum(n_chars) AS BIGINT) AS tok
           FROM documents GROUP BY source),
         m AS (SELECT max(tok) AS mx FROM s),
         e AS (SELECT source, n_docs,
                 least(4, (m.mx + s.tok - 1) // s.tok) AS epochs FROM s, m)
         SELECT source, n_docs, epochs, n_docs * epochs AS n_rows
         FROM e ORDER BY source""",
    "e24_rfm_segments" ->
      """WITH c AS (
           SELECT o_custkey AS cust,
             CAST(floor(epoch(max(o_orderdate))) AS BIGINT) // 86400 AS r,
             count(*) AS f,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS mc
           FROM orders GROUP BY 1),
         ks AS (SELECT unnest([1, 2, 3, 4]) AS k),
         rb AS (SELECT list(b ORDER BY k) AS bs FROM (
           SELECT k, min(v) AS b FROM
             (SELECT v, sum(n) OVER (ORDER BY v) AS cw, sum(n) OVER () AS tw
              FROM (SELECT r AS v, count(*) AS n FROM c GROUP BY 1)), ks
           WHERE 5 * cw >= k * tw GROUP BY k)),
         fb AS (SELECT list(b ORDER BY k) AS bs FROM (
           SELECT k, min(v) AS b FROM
             (SELECT v, sum(n) OVER (ORDER BY v) AS cw, sum(n) OVER () AS tw
              FROM (SELECT f AS v, count(*) AS n FROM c GROUP BY 1)), ks
           WHERE 5 * cw >= k * tw GROUP BY k)),
         mb AS (SELECT list(b ORDER BY k) AS bs FROM (
           SELECT k, min(v) AS b FROM
             (SELECT v, sum(n) OVER (ORDER BY v) AS cw, sum(n) OVER () AS tw
              FROM (SELECT mc AS v, count(*) AS n FROM c GROUP BY 1)), ks
           WHERE 5 * cw >= k * tw GROUP BY k)),
         q AS (
           SELECT c.cust, c.mc,
             1 + len(list_filter(rb.bs, x -> c.r > x)) AS rq,
             1 + len(list_filter(fb.bs, x -> c.f > x)) AS fq,
             1 + len(list_filter(mb.bs, x -> c.mc > x)) AS mq
           FROM c, rb, fb, mb)
         SELECT rq * 100 + fq * 10 + mq AS segment, count(*) AS n_customers,
           CAST(sum(mc) AS BIGINT) AS sum_monetary_cents
         FROM q GROUP BY 1 ORDER BY 1"""
  )
}
