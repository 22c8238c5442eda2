package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-8 batch 94: change-point detection, the composite quality gate,
  * and product stickiness.
  *
  *  - a45_changepoint: single change-point detection per event type over
  *    the daily cent-volume series — the binary-segmentation first split:
  *    argmin over split days τ of SSE(≤τ) + SSE(>τ), restated via the
  *    identity SSE = Σy² − (Σy)²/n so the argmin needs only prefix
  *    (count, Σy) pairs plus the per-type total Σy² (the per-side Σy²
  *    terms cancel) — ALL kept as exact BIGINTs (y is a
  *    daily cent sum ≤ ~2³⁰ here, so y² ≤ 2⁶⁰ and the 366-day Σy² stays
  *    far under 2⁶³; a deployment whose daily sums approach 2³¹·⁵ would
  *    rescale the unit first), so the cost at each τ is a FIXED 5-node
  *    IEEE dag over exact integers and both engines produce the same
  *    bits. The selected τ minimizes cost with day-ascending tie-break,
  *    pinned identically by the (cost, day) struct-min. Completes the
  *    monitoring family beside e29 (CUSUM) and a36 (Mann–Kendall).
  *  - tp36_quality_gate: the composite document gate in the style of the
  *    public Gopher/MassiveText rules — per-doc booleans (word count in
  *    [20, 1000]; mean word length in [2, 12]; top-word share < 0.2;
  *    repeated-2-gram fraction < 0.3) and the conjunction as `keep`.
  *    Each rule input is an exact integer ratio; thresholds compare
  *    integer cross-products (n·maxw < k·nw style) so no float decides a
  *    boundary. The gate's value is the FLAGS, not just the verdict —
  *    curation pipelines tune one rule at a time.
  *  - e35_stickiness: DAU/WAU per day — distinct daily actives over
  *    distinct trailing-7-day actives. WAU dedups users ACROSS the
  *    window, so it is not a windowed sum: the (user, day) activity set
  *    joins a bounded day spine on membership in [d−6, d], then
  *    aggregates distinct users per spine day. Work is bounded by
  *    |activity| × 7 with a broadcast spine; output is calendar-bounded.
  *
  * Scale shapes: a45's argmin runs over per-type ≤366-row daily
  * artifacts (broadcast pair join, the a35/a36/a44 argument); tp36 is
  * explode → doc-keyed hash aggregates exactly like tp35; e35's
  * membership join fans each activity row out at most 7× before the
  * distinct — never a cross join, never a per-user window.
  *
  * Reference context: no counterpart; extends the a- (monitoring), tp-
  * (curation) and e- (product analytics) layers.
  */
object Extended94 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- a45: binary-segmentation change point on daily cent volume ----
    "a45_changepoint" -> ((s, d) => {
      val dy = t(s, d, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy("event_type", "day").agg(sum("cents").as("y"))
      // prefix triples at every candidate split: pair join day' <= tau,
      // bounded by the day-domain square per type
      val pre = dy.as("a")
        .join(broadcast(dy.as("b")),
          col("a.event_type") === col("b.event_type") &&
            col("b.day") <= col("a.day"))
        .groupBy(col("a.event_type").as("event_type"), col("a.day").as("tau"))
        .agg(count(lit(1)).as("nl"), sum(col("b.y")).as("sl"))
      val tot = dy.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("y").as("st"),
          sum(col("y") * col("y")).as("qt"))
      // cost(tau) = qt - sl^2/nl - (st-sl)^2/(n-nl); the last day (nl = n)
      // is no split and is excluded
      // exact-integer numerators (sl² and (st−sl)² fit in BIGINT at this
      // unit scale), one division each: the cost dag is qt − sl²/nl −
      // (st−sl)²/(n−nl) with identical IEEE order in the oracle
      val scored = pre.join(broadcast(tot), "event_type")
        .filter(col("nl") < col("n"))
        .select(col("event_type"), col("tau"),
          (col("qt").cast("double")
            - (col("sl") * col("sl")).cast("double") / col("nl").cast("double")
            - ((col("st") - col("sl")) * (col("st") - col("sl"))).cast("double")
              / (col("n") - col("nl")).cast("double")).as("cost"))
      scored.groupBy("event_type")
        .agg(min(struct(col("cost"), col("tau"))).as("m"))
        .select(col("event_type"), col("m.tau").as("change_day"),
          round(col("m.cost"), 4).as("split_cost"))
        .orderBy("event_type")
    }),

    // ---- tp36: composite Gopher-style quality gate ----
    "tp36_quality_gate" -> ((s, d) => {
      val w = t(s, d, "documents")
        .select(col("doc_id"), col("text"), split(col("text"), " ").as("words"))
        .filter(size(col("words")) >= 2)
      val grams = w.select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(words) - 2), " +
            "i -> concat_ws(' ', words[i], words[i + 1]))")).as("gram"))
        .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(sum("c").as("n2"), count(lit(1)).as("d2"))
      val words = w.select(col("doc_id"), explode(col("words")).as("word"))
        .groupBy("doc_id", "word")
        .agg(count(lit(1)).as("c"), sum(length(col("word"))).as("chars"))
        .groupBy("doc_id")
        .agg(max("c").as("maxw"), sum("c").as("nw"), sum("chars").as("nc"))
      grams.join(words, "doc_id")
        .select(col("doc_id"),
          // integer cross-products decide every boundary — no float ratio
          (col("nw") >= 20 && col("nw") <= 1000).as("len_ok"),
          (col("nc") >= lit(2) * col("nw") &&
            col("nc") <= lit(12) * col("nw")).as("word_len_ok"),
          (lit(5) * col("maxw") < col("nw")).as("top_word_ok"),
          (lit(10) * (col("n2") - col("d2")) < lit(3) * col("n2")).as("rep_ok"))
        .withColumn("keep",
          col("len_ok") && col("word_len_ok") && col("top_word_ok") && col("rep_ok"))
        .orderBy("doc_id")
    }),

    // ---- e35: DAU / trailing-7-day WAU stickiness per day ----
    "e35_stickiness" -> ((s, d) => {
      val acts = t(s, d, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .distinct()
      val spine = acts.select(col("day").as("spine_day")).distinct()
      val dau = acts.groupBy(col("day").as("spine_day"))
        .agg(count(lit(1)).as("dau"))
      val wau = acts.join(broadcast(spine),
          col("day") <= col("spine_day") && col("day") >= col("spine_day") - 6)
        .select(col("spine_day"), col("user_id")).distinct()
        .groupBy("spine_day").agg(count(lit(1)).as("wau"))
      dau.join(wau, "spine_day")
        .select(col("spine_day").as("day"), col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau").cast("double"), 6)
            .as("stickiness"))
        .orderBy("day")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "a45_changepoint" ->
      """WITH dy AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         pre AS (
           SELECT a.event_type, a.day AS tau,
             count(*) AS nl, CAST(sum(b.y) AS BIGINT) AS sl
           FROM dy a JOIN dy b
             ON a.event_type = b.event_type AND b.day <= a.day
           GROUP BY 1, 2),
         tot AS (
           SELECT event_type, count(*) AS n, CAST(sum(y) AS BIGINT) AS st,
             CAST(sum(y * y) AS BIGINT) AS qt
           FROM dy GROUP BY 1),
         scored AS (
           SELECT pre.event_type, tau,
             CAST(qt AS DOUBLE)
               - CAST(sl * sl AS DOUBLE) / CAST(nl AS DOUBLE)
               - CAST((st - sl) * (st - sl) AS DOUBLE)
                 / CAST(n - nl AS DOUBLE) AS cost
           FROM pre JOIN tot USING (event_type)
           WHERE nl < n),
         best AS (
           SELECT event_type, tau AS change_day, cost,
             row_number() OVER (PARTITION BY event_type
               ORDER BY cost, tau) AS rn
           FROM scored)
         SELECT event_type, change_day, round(cost, 4) AS split_cost
         FROM best WHERE rn = 1 ORDER BY event_type""",
    "tp36_quality_gate" ->
      """WITH w AS (
           SELECT doc_id, string_split(text, ' ') AS words
           FROM documents WHERE len(string_split(text, ' ')) >= 2),
         g AS (
           SELECT doc_id, array_to_string(words[i+1:i+2], ' ') AS gram
           FROM w, LATERAL (SELECT unnest(range(0, len(words) - 1)) AS i) r),
         gc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
         ga AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n2,
                  count(*) AS d2 FROM gc GROUP BY 1),
         wd AS (SELECT doc_id, unnest(words) AS word FROM w),
         wc AS (SELECT doc_id, word, count(*) AS c,
                  CAST(sum(length(word)) AS BIGINT) AS chars
                FROM wd GROUP BY 1, 2),
         wa AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS maxw,
                  CAST(sum(c) AS BIGINT) AS nw,
                  CAST(sum(chars) AS BIGINT) AS nc
                FROM wc GROUP BY 1)
         SELECT ga.doc_id,
           nw >= 20 AND nw <= 1000 AS len_ok,
           nc >= 2 * nw AND nc <= 12 * nw AS word_len_ok,
           5 * maxw < nw AS top_word_ok,
           10 * (n2 - d2) < 3 * n2 AS rep_ok,
           (nw >= 20 AND nw <= 1000) AND (nc >= 2 * nw AND nc <= 12 * nw)
             AND (5 * maxw < nw) AND (10 * (n2 - d2) < 3 * n2) AS keep
         FROM ga JOIN wa USING (doc_id) ORDER BY doc_id""",
    "e35_stickiness" ->
      """WITH acts AS (
           SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
           FROM events),
         spine AS (SELECT DISTINCT day AS spine_day FROM acts),
         dau AS (SELECT day AS spine_day, count(*) AS dau
                 FROM acts GROUP BY 1),
         wau AS (
           SELECT spine_day, count(DISTINCT user_id) AS wau
           FROM acts JOIN spine
             ON day <= spine_day AND day >= spine_day - 6
           GROUP BY 1)
         SELECT spine_day AS day, dau, wau,
           round(CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE), 6) AS stickiness
         FROM dau JOIN wau USING (spine_day)
         ORDER BY day"""
  )
}
