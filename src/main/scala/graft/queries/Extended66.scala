package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.PrefixSum

/** Round-7 batch 66: exact rank and association statistics — the
  * "does this feature correlate with that one" layer, computed without
  * float accumulation hazards.
  *
  *  - a30_spearman: EXACT Spearman rank correlation between quantity
  *    and price-in-cents over the fact table. Midranks (tie-corrected)
  *    are integers when doubled: 2·midrank(v) = 2·cumBefore(v) +
  *    count(v) + 1, straight off one [[graft.operators.PrefixSum]]
  *    pass per variable over the VALUE HISTOGRAM (domain-, not
  *    row-, proportional). Rank tables broadcast back onto the rows,
  *    every power sum accumulates as decimal(38,0) — exact under any
  *    combine order and any corpus size — and the one
  *    sqrt-and-divide at the end is the same IEEE sequence on both
  *    engines (the doubled-rank scale factors cancel). One engine
  *    quirk the oracle works around: DuckDB's HUGEINT→DOUBLE cast
  *    converts via two 64-bit halves and can land one ulp off the
  *    correctly-rounded double (seen live at sf0.1), while Spark's
  *    Decimal→double (BigDecimal.doubleValue) rounds correctly — so
  *    the oracle hops the >2^63 integers through VARCHAR, whose
  *    strtod parse IS correctly rounded.
  *  - a31_cramers_v: Cramér's V over the lang × source contingency
  *    table. Cell contributions are (o·n − r·c)²/(n·r·c) — integer
  *    numerators, one division each — and the cross-cell χ² total is a
  *    SEQUENTIAL left fold over the (lang, source)-ordered cell list
  *    on both engines (Spark `aggregate` over a sorted array, DuckDB
  *    `list_reduce` over `list(… ORDER BY …)`), so no distributed
  *    float sum enters the parity surface. The contingency table is
  *    categorical-domain-sized (≤ langs × sources cells), a bounded
  *    artifact at any corpus size.
  *
  * Reference context: no counterpart in the reference; extends the
  * a-family statistics (a16 regression battery, a29 chi-square drift).
  */
object Extended66 {
  type Q = (SparkSession, String) => DataFrame

  /** (value → 2·midrank) table from a histogram via one PrefixSum pass. */
  private def rankTable(rows: DataFrame, valCol: String, out: String,
      width: Double): DataFrame = {
    val h = rows.groupBy(valCol).agg(count(lit(1)).as("c"))
    PrefixSum.cumSum(h, valCol, Seq("c"), bucketWidth = width)
      .select(col(valCol),
        (lit(2L) * col("pre_c") + col("c") + lit(1L)).as(out))
  }

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  val queries: Map[String, Q] = Map(
    // ---- a30: exact Spearman rank correlation (quantity vs price) ----
    "a30_spearman" -> ((s, d) => {
      // NO fanOut/checkpoint here: the r12 materialization (round-robin
      // shuffle + localCheckpoint of the (q, p) projection) cost MORE than
      // the triple parquet scan it saved — the scan is a cheap columnar
      // read of two pruned columns, not CPU-dense per-row work (measured
      // 2.17 → 2.50 s medians shipped, 3.88 s in the r13 baseline;
      // reverting restores the three independent pruned scans)
      val rows = t(s, d, "lineitem").select(
        col("l_quantity").cast("long").as("q"),
        round(col("l_extendedprice") * 100).cast("long").as("p"))
      val rx = rankTable(rows, "q", "rx", width = 16.0)
      val ry = rankTable(rows, "p", "ry", width = 4096.0)
      val ranked = rows
        .join(broadcast(rx), Seq("q")).join(broadcast(ry), Seq("p"))
      val agg = ranked.agg(
        count(lit(1)).as("n"),
        sum(dec(col("rx"))).as("sx"), sum(dec(col("ry"))).as("sy"),
        sum(dec(col("rx")) * dec(col("ry"))).as("sxy"),
        sum(dec(col("rx")) * dec(col("rx"))).as("sxx"),
        sum(dec(col("ry")) * dec(col("ry"))).as("syy"))
      agg.select(col("n"),
        ((dec(col("n")) * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt((dec(col("n")) * col("sxx") - col("sx") * col("sx")).cast("double") *
            (dec(col("n")) * col("syy") - col("sy") * col("sy")).cast("double")))
          .as("spearman"))
    }),

    // ---- a31: Cramér's V over the lang × source contingency table ----
    "a31_cramers_v" -> ((s, d) => {
      val o = t(s, d, "documents")
        .groupBy("lang", "source").agg(count(lit(1)).as("o"))
      val rt = o.groupBy("lang").agg(sum("o").as("r"))
      val ct = o.groupBy("source").agg(sum("o").as("c"))
      val tot = o.agg(sum("o").as("n"),
        count_distinct(col("lang")).as("nl"),
        count_distinct(col("source")).as("ns"))
      val cells = o.join(broadcast(rt), Seq("lang"))
        .join(broadcast(ct), Seq("source"))
        .crossJoin(broadcast(tot))
        .select(col("lang"), col("source"), col("n"), col("nl"), col("ns"),
          { val num = col("o") * col("n") - col("r") * col("c")
            ((num * num).cast("double") /
              (col("n") * col("r") * col("c")).cast("double")).as("contrib") })
      // χ² as a sequential fold in (lang, source) order — the cell list
      // is categorical-domain-sized, one row after the final agg
      val folded = cells.groupBy("n", "nl", "ns")
        .agg(sort_array(collect_list(struct(col("lang"), col("source"),
          col("contrib")))).as("a"))
        .select(col("n"), col("nl"), col("ns"),
          aggregate(transform(col("a"), x => x("contrib")), lit(0.0),
            (acc, x) => acc + x).as("chi2"))
      folded.select(col("n"), col("chi2"),
        sqrt(col("chi2") / (col("n") * least(col("nl") - 1, col("ns") - 1))
          .cast("double")).as("cramers_v"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "a30_spearman" ->
      """WITH r AS (
           SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS p
           FROM lineitem),
         hq AS (SELECT q, count(*) AS c FROM r GROUP BY q),
         cq AS (SELECT q,
             2 * sum(c) OVER (ORDER BY q) - c + 1 AS rx FROM hq),
         hp AS (SELECT p, count(*) AS c FROM r GROUP BY p),
         cp AS (SELECT p,
             2 * sum(c) OVER (ORDER BY p) - c + 1 AS ry FROM hp),
         j AS (
           SELECT rx, ry FROM r
           JOIN cq ON r.q = cq.q JOIN cp ON r.p = cp.p),
         s AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             sum(rx) AS sx, sum(ry) AS sy, sum(rx * ry) AS sxy,
             sum(rx * rx) AS sxx, sum(ry * ry) AS syy
           FROM j)
         SELECT n,
           CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) /
             sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) *
                  CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)) AS spearman
         FROM s""",
    "a31_cramers_v" ->
      """WITH o AS (
           SELECT lang, source, CAST(count(*) AS BIGINT) AS o
           FROM documents GROUP BY lang, source),
         rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM o GROUP BY lang),
         ct AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM o
                GROUP BY source),
         tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
             CAST(count(DISTINCT lang) AS BIGINT) AS nl,
             CAST(count(DISTINCT source) AS BIGINT) AS ns FROM o),
         cells AS (
           SELECT o.lang, o.source, tot.n, tot.nl, tot.ns,
             CAST((o.o * tot.n - rt.r * ct.c) * (o.o * tot.n - rt.r * ct.c)
               AS DOUBLE) / CAST(tot.n * rt.r * ct.c AS DOUBLE) AS contrib
           FROM o JOIN rt ON o.lang = rt.lang
           JOIN ct ON o.source = ct.source CROSS JOIN tot),
         folded AS (
           SELECT n, nl, ns,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(contrib ORDER BY lang, source)), (a, b) -> a + b) AS chi2
           FROM cells GROUP BY n, nl, ns)
         SELECT n, chi2,
           sqrt(chi2 / CAST(n * least(nl - 1, ns - 1) AS DOUBLE)) AS cramers_v
         FROM folded"""
  )
}
