package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.PrefixSum

/** Round-8 batch 99: the nonparametric two-sample test and the
  * information-theoretic dependence measure — the two staples left open
  * in the drift/monitoring family.
  *
  *  - a48_mann_whitney: the Wilcoxon rank-sum / Mann–Whitney U test on
  *    purchase-vs-click cent values. a39 (Welch) is the normal-theory
  *    location test; the rank-sum test is its distribution-free twin —
  *    the one that survives the heavy-tailed value distributions real
  *    revenue columns have. The integer spine: a pooled cent histogram
  *    carries per-group tie counts, one [[PrefixSum]] pass (bucket-keyed,
  *    never a single-partition window) gives the mass strictly below
  *    each value, so 2·midrank = 2·below + ties + 1 stays integral;
  *    2·R₁ = Σ c₁·(2·below+ties+1) and the tie correction Σ(t³−t) are
  *    exact BIGINT-domain sums (DECIMAL(38,0) — overflow-loud, the a39
  *    discipline). U, μ_U, the tie-corrected σ_U and z are a fixed IEEE
  *    dag over those integers, identical in both engines.
  *  - a49_mutual_info: mutual information (and the √(H_r·H_c)-normalized
  *    NMI) of the order-priority × order-status contingency table —
  *    the dependence measure that catches ANY association, where a31's
  *    Cramér's V norms χ²'s linear-ish signal. Cell/margin counts are
  *    exact integers from one hash aggregate; each cell contributes
  *    (o/n)·ln(o·n/(r·c)) and the cell list is folded in sorted
  *    (priority, status) order — the a31 pinned-fold discipline — so
  *    the float sequence is identical in both engines. Margins fold the
  *    same way for the two entropies.
  *
  * Scale shape: a48 is one scan → cent-domain histogram (bounded by the
  * value domain, not row count) → PrefixSum (two parallel levels) → one
  * row. a49 is one scan → hash aggregate on a categorical-domain cell
  * relation (tens of rows at any sf) → broadcast margin joins → one row.
  * Neither has a per-row window or a driver loop.
  *
  * Reference context: no counterpart; completes the a-family beside
  * a28 (KS), a39 (Welch) and a31 (Cramér's V).
  */
object Extended99 {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  val queries: Map[String, Q] = Map(
    // ---- a48: Mann–Whitney U (purchase vs click cents) ----
    "a48_mann_whitney" -> ((s, d) => {
      val r = t(s, d, "events")
        .filter(col("event_type").isin("purchase", "click"))
        .select(round(col("value") * 100).cast("long").as("x"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("g"))
      val h = r.groupBy("x").agg(
        sum("g").as("c1"), sum(lit(1L) - col("g")).as("c2"),
        count(lit(1)).as("c"))
      // pooled mass strictly below each cent value — bucket-keyed scan,
      // cents domain ≈ value range ·100 (sf-invariant), width √domain
      val cum = PrefixSum.cumSum(h, "x", Seq("c"), bucketWidth = 1024.0)
      val agg = cum.agg(
        sum("c1").as("n1"), sum("c2").as("n2"),
        // 2·R₁ = Σ c₁·(2·below + ties + 1): exact, DECIMAL against sf1+
        sum(dec(col("c1")) * (lit(2L) * dec(col("pre_c")) + dec(col("c"))
          + lit(1L))).as("two_r1"),
        sum(dec(col("c")) * dec(col("c")) * dec(col("c")) - dec(col("c")))
          .as("tie_term"))
      val n = col("n1") + col("n2")
      val u = (col("two_r1") - dec(col("n1") * (col("n1") + lit(1L))))
        .cast("double") / lit(2.0)
      val mu = (col("n1") * col("n2")).cast("double") / lit(2.0)
      val sigma = sqrt((col("n1") * col("n2")).cast("double") / lit(12.0) *
        ((n + lit(1L)).cast("double") -
          col("tie_term").cast("double") / (n * (n - lit(1L))).cast("double")))
      agg.select(col("n1"), col("n2"),
        col("two_r1").cast("long").as("two_r1"),
        col("tie_term").cast("long").as("tie_term"),
        u.as("u"), round((u - mu) / sigma, 6).as("z"))
    }),

    // ---- a49: mutual information of priority × status ----
    "a49_mutual_info" -> ((s, d) => {
      val o = t(s, d, "orders")
        .groupBy(col("o_orderpriority").as("pr"), col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("o"))
      val rt = o.groupBy("pr").agg(sum("o").as("r"))
      val ct = o.groupBy("st").agg(sum("o").as("c"))
      val tot = o.agg(sum("o").as("n"))
      def pinnedSum(df: DataFrame, keys: Seq[String], contrib: Column,
          out: String): DataFrame =
        df.select(sort_array(collect_list(struct(
            keys.map(col) :+ contrib.as("contrib"): _*))).as("a"))
          .select(aggregate(transform(col("a"), x => x("contrib")), lit(0.0),
            (acc, x) => acc + x).as(out))
      val cells = o.join(broadcast(rt), Seq("pr"))
        .join(broadcast(ct), Seq("st")).crossJoin(broadcast(tot))
      // MI in nats: Σ (o/n)·ln(o·n/(r·c)) folded in (pr, st) order; the
      // per-cell dag is one division + one log + one multiply, and the
      // fold sequence is pinned by the sorted struct list (a31 discipline)
      val mi = pinnedSum(cells, Seq("pr", "st"),
        (col("o").cast("double") / col("n").cast("double")) *
          log((col("o") * col("n")).cast("double") /
            (col("r") * col("c")).cast("double")), "mi")
      val hr = pinnedSum(rt.crossJoin(broadcast(tot)), Seq("pr"),
        -(col("r").cast("double") / col("n").cast("double")) *
          log(col("r").cast("double") / col("n").cast("double")), "hr")
      val hc = pinnedSum(ct.crossJoin(broadcast(tot)), Seq("st"),
        -(col("c").cast("double") / col("n").cast("double")) *
          log(col("c").cast("double") / col("n").cast("double")), "hc")
      tot.crossJoin(mi).crossJoin(hr).crossJoin(hc)
        .select(col("n"), round(col("mi"), 9).as("mi_nats"),
          round(col("mi") / sqrt(col("hr") * col("hc")), 9).as("nmi"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "a48_mann_whitney" ->
      """WITH r AS (
           SELECT CAST(round(value * 100) AS BIGINT) AS x,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g
           FROM events WHERE event_type IN ('purchase', 'click')),
         h AS (
           SELECT x, CAST(sum(g) AS BIGINT) AS c1,
             CAST(sum(1 - g) AS BIGINT) AS c2,
             CAST(count(*) AS BIGINT) AS c
           FROM r GROUP BY x),
         cum AS (
           SELECT *, CAST(coalesce(sum(c) OVER (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS below
           FROM h),
         agg AS (
           SELECT CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c2) AS BIGINT) AS n2,
             CAST(sum(CAST(c1 AS HUGEINT) * (2 * CAST(below AS HUGEINT)
               + c + 1)) AS BIGINT) AS two_r1,
             CAST(sum(CAST(c AS HUGEINT) * c * c - c) AS BIGINT) AS tie_term
           FROM cum),
         z AS (
           SELECT *,
             CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u,
             CAST(n1 * n2 AS DOUBLE) / 2.0 AS mu,
             sqrt(CAST(n1 * n2 AS DOUBLE) / 12.0
               * (CAST(n1 + n2 + 1 AS DOUBLE)
                 - CAST(tie_term AS DOUBLE)
                   / CAST((n1 + n2) * (n1 + n2 - 1) AS DOUBLE))) AS sigma
           FROM agg)
         SELECT n1, n2, two_r1, tie_term, u, round((u - mu) / sigma, 6) AS z
         FROM z""",
    "a49_mutual_info" ->
      """WITH o AS (
           SELECT o_orderpriority AS pr, o_orderstatus AS st,
             CAST(count(*) AS BIGINT) AS o
           FROM orders GROUP BY 1, 2),
         rt AS (SELECT pr, CAST(sum(o) AS BIGINT) AS r FROM o GROUP BY pr),
         ct AS (SELECT st, CAST(sum(o) AS BIGINT) AS c FROM o GROUP BY st),
         tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
         mi AS (
           SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list((CAST(o.o AS DOUBLE) / CAST(tot.n AS DOUBLE))
               * ln(CAST(o.o * tot.n AS DOUBLE)
                 / CAST(rt.r * ct.c AS DOUBLE)) ORDER BY o.pr, o.st)),
             (a, b) -> a + b) AS mi
           FROM o JOIN rt ON o.pr = rt.pr JOIN ct ON o.st = ct.st
           CROSS JOIN tot),
         hr AS (
           SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(-(CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
               * ln(CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) ORDER BY pr)),
             (a, b) -> a + b) AS hr
           FROM rt CROSS JOIN tot),
         hc AS (
           SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
               * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) ORDER BY st)),
             (a, b) -> a + b) AS hc
           FROM ct CROSS JOIN tot)
         SELECT n, round(mi, 9) AS mi_nats,
           round(mi / sqrt(hr * hc), 9) AS nmi
         FROM tot CROSS JOIN mi CROSS JOIN hr CROSS JOIN hc"""
  )
}
