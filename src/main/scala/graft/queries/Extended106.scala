package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.PrefixSum

/** Round-8 batch 106: vocabulary coverage planning and inequality
  * decomposition — one tokenizer-budget staple, one mixture-audit
  * staple.
  *
  *  - tp38_coverage_curve: what fraction of all token OCCURRENCES the
  *    top-k vocabulary types cover, for k ∈ {100, 1000, 5000} — the
  *    curve that sizes a tokenizer's vocab (and prices truncating it).
  *    The k-th largest count is an ORDER STATISTIC, so the engine never
  *    sorts the vocabulary: a count-of-counts histogram + one
  *    [[PrefixSum]] pass gives, per distinct count value c, the number
  *    of types and token mass strictly above c; the k-boundary is one
  *    broadcast inequality join against that (tiny) histogram, and
  *    coverage = mass_above + (k − types_above)·c* — exact integers.
  *    Ties at the boundary all carry the same count, so the SUM is
  *    tiebreak-invariant and the oracle can restate it with a plain
  *    row_number ≤ k window.
  *  - a53_theil_decomposition: the Theil T inequality index of daily
  *    cent volumes, decomposed into between-type and within-type
  *    components (T = T_between + Σ share_g·T_g — the additivity Gini
  *    lacks, which is why mixture audits use Theil). Daily sums are
  *    exact integers; each group's fold runs over its calendar-bounded
  *    day list in day order, and the between fold over the five types
  *    in type order (pinned-fold discipline).
  *
  * Scale shape: tp38 aggregates to the vocabulary then to the
  * count-of-counts domain (≤ distinct-count values, sf-log-ish) — no
  * global sort at any size; a53 is calendar-bounded after one hash
  * aggregate. No unkeyed windows except PrefixSum's bucket-summary
  * level (sf-invariant rows).
  *
  * Reference context: no counterpart; extends tp- (training pipeline)
  * and a- (distribution audit) families.
  */
object Extended106 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- tp38: top-k vocabulary coverage curve ----
    "tp38_coverage_curve" -> ((s, d) => {
      val tc = t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy("term").agg(count(lit(1)).as("c"))
      // count-of-counts histogram: distinct count value c → (#types m,
      // token mass c·m); PrefixSum in ascending c gives inclusive cums
      val cc = tc.groupBy("c").agg(count(lit(1)).as("m"))
        .withColumn("mass", col("c") * col("m"))
      val cum = PrefixSum.cumSum(cc, "c", Seq("m", "mass"), bucketWidth = 64.0)
      val tot = cum.agg(sum("m").as("n_types"), sum("mass").as("n_tokens"))
      // types/mass STRICTLY above c = total − inclusive cum at c
      val ranked = cum.crossJoin(broadcast(tot))
        .select(col("c"), col("m"),
          (col("n_types") - col("cum_m")).as("types_above"),
          (col("n_tokens") - col("cum_mass")).as("mass_above"),
          col("n_types"), col("n_tokens"))
      val ks = s.range(1).select(explode(array(lit(100L), lit(1000L),
        lit(5000L))).as("k"))
      // boundary row: types_above < k_eff ≤ types_above + m  ⟺  c is the
      // k-th largest count; k_eff caps k at the vocabulary size
      ks.join(broadcast(ranked),
          least(col("k"), col("n_types")) > col("types_above") &&
            least(col("k"), col("n_types")) <= col("types_above") + col("m"))
        .select(col("k"), col("n_types"), col("n_tokens"),
          (col("mass_above") +
            (least(col("k"), col("n_types")) - col("types_above")) * col("c"))
            .as("covered_tokens"))
        .withColumn("coverage", round(col("covered_tokens").cast("double") /
          col("n_tokens").cast("double"), 6))
        .orderBy("k")
    }),

    // ---- a53: Theil index with between/within decomposition ----
    "a53_theil_decomposition" -> ((s, d) => {
      val dy = t(s, d, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy("event_type", "day").agg(sum("cents").as("y"))
      val g = dy.groupBy("event_type")
        .agg(count(lit(1)).as("ng"), sum("y").as("yg"),
          sort_array(collect_list(struct(col("day"), col("y")))).as("arr"))
      val tot = g.agg(sum("ng").as("nn"), sum("yg").as("yy"),
        sort_array(collect_list(struct(col("event_type"), col("ng"),
          col("yg")))).as("garr"))
      // T_g = Σ_days (y/Y_g)·ln(n_g·y/Y_g), folded in day order
      val within = g.select(col("event_type"), col("ng"), col("yg"),
        aggregate(transform(col("arr"), x => x("y")), lit(0.0),
          (acc, y) => {
            val p = y.cast("double") / col("yg").cast("double")
            acc + p * log((col("ng") * y).cast("double") /
              col("yg").cast("double"))
          }).as("t_within"))
      // T_between = Σ_types (Y_g/Y)·ln((Y_g/Y)·(N/n_g)), folded in type order
      val between = tot.select(col("nn"), col("yy"),
        aggregate(col("garr"), lit(0.0),
          (acc, gg) => {
            val sh = gg.getField("yg").cast("double") / col("yy").cast("double")
            acc + sh * log((gg.getField("yg") * col("nn")).cast("double") /
              (col("yy") * gg.getField("ng")).cast("double"))
          }).as("t_between"))
      within.crossJoin(broadcast(between))
        .select(col("event_type"), col("ng").as("n_days"),
          round(col("yg").cast("double") / col("yy").cast("double"), 9)
            .as("share"),
          round(col("t_within"), 9).as("t_within"),
          round(col("t_between"), 9).as("t_between"))
        .orderBy("event_type")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "tp38_coverage_curve" ->
      """WITH tc AS (
           SELECT t.term, CAST(count(*) AS BIGINT) AS c
           FROM (SELECT unnest(string_split(text, ' ')) AS term
                 FROM documents) t
           WHERE len(t.term) > 0 GROUP BY t.term),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(c) AS BIGINT) AS n_tokens FROM tc),
         ranked AS (
           SELECT c, row_number() OVER (ORDER BY c DESC, term) AS rn
           FROM tc),
         ks AS (SELECT unnest([100, 1000, 5000]) AS k)
         SELECT CAST(k AS BIGINT) AS k, n_types, n_tokens,
           (SELECT CAST(sum(c) AS BIGINT) FROM ranked
            WHERE rn <= least(k, n_types)) AS covered_tokens,
           round(CAST((SELECT sum(c) FROM ranked
               WHERE rn <= least(k, n_types)) AS DOUBLE)
             / CAST(n_tokens AS DOUBLE), 6) AS coverage
         FROM ks CROSS JOIN tot ORDER BY k""",
    "a53_theil_decomposition" ->
      """WITH dy AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         g AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(y) AS BIGINT) AS yg
           FROM dy GROUP BY event_type),
         tw AS (
           SELECT d.event_type, g.ng, g.yg,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list((CAST(d.y AS DOUBLE) / CAST(g.yg AS DOUBLE))
                 * ln(CAST(g.ng * d.y AS DOUBLE) / CAST(g.yg AS DOUBLE))
                 ORDER BY d.day)), (a, b) -> a + b) AS t_within
           FROM dy d JOIN g ON d.event_type = g.event_type
           GROUP BY d.event_type, g.ng, g.yg),
         tot AS (SELECT CAST(sum(ng) AS BIGINT) AS nn,
             CAST(sum(yg) AS BIGINT) AS yy FROM g),
         tb AS (
           SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list((CAST(yg AS DOUBLE) / CAST(yy AS DOUBLE))
               * ln(CAST(yg * nn AS DOUBLE) / CAST(yy * ng AS DOUBLE))
               ORDER BY event_type)), (a, b) -> a + b) AS t_between
           FROM g CROSS JOIN tot)
         SELECT event_type, ng AS n_days,
           round(CAST(yg AS DOUBLE) / CAST(yy AS DOUBLE), 9) AS share,
           round(t_within, 9) AS t_within,
           round(t_between, 9) AS t_between
         FROM tw CROSS JOIN tot CROSS JOIN tb ORDER BY event_type"""
  )
}
