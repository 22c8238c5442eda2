package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-8 batch 102: corpus-level lexical statistics — term burstiness
  * and the character-level entropy RATE — completing the text-quality
  * family beside t20 (unigram char entropy), t24 (n-gram novelty) and
  * t30 (lexical diversity).
  *
  *  - t31_term_burstiness: the Fisher variance-to-mean ratio of each
  *    term's per-document count, zeros included — VMR 1 means Poisson
  *    scatter, VMR ≫ 1 a bursty term that concentrates in few documents
  *    (topical words burst; function words don't). Zeros are handled
  *    analytically: with D docs, S = Σ per-doc counts and Q = Σ counts²
  *    over ONLY the docs containing the term,
  *    VMR = (D·Q − S²)/(D·S) — one division over exact BIGINT-domain
  *    integers from one token scan + two hash aggregates. Top 15 by
  *    total count (term-ascending tiebreak) via TakeOrdered.
  *  - t32_entropy_rate: per-source conditional bigram entropy
  *    H(next char | char) = −Σ_{xy} (c_xy/N)·ln(c_xy/c_x•) — the
  *    first-order entropy RATE. t20's unigram entropy scores symbol
  *    spread; the conditional rate scores *predictability*, the signal
  *    that separates natural text from noise at equal alphabet use.
  *    Bigram counts are one scan + hash aggregate; context counts
  *    c_x• = Σ_y c_xy come from re-aggregating the bigram relation (no
  *    second scan); the float fold runs in sorted bigram order per
  *    source (the t20/a31 pinned-fold discipline).
  *
  * Scale shape: both are explode → hash-aggregate pipelines whose
  * aggregate relations are vocabulary- or alphabet²-bounded, not
  * corpus-bounded; the only sort is the k-bounded terminal TakeOrdered
  * (t31) and the per-source alphabet²-sized fold list (t32).
  *
  * Reference context: no counterpart; extends the t-family (SURVEY §2
  * text-analysis layer).
  */
object Extended102 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- t31: Fisher burstiness (variance-to-mean) per term ----
    "t31_term_burstiness" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val nDocs = docs.agg(count(lit(1)).as("dd"))
      val tc = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      val per = tc.groupBy("term").agg(
        count(lit(1)).as("df"), sum("c").as("s"),
        sum(col("c") * col("c")).as("q"))
      // VMR over ALL docs, zeros analytic: (D·Q − S²)/(D·S); the numerator
      // is exact in the BIGINT domain at any corpus size that keeps per-term
      // counts < ~3·10⁹ (DECIMAL would be the next notch; documented bound)
      per.crossJoin(broadcast(nDocs))
        .select(col("term"), col("df"), col("s"),
          round((col("dd") * col("q") - col("s") * col("s")).cast("double") /
            (col("dd") * col("s")).cast("double"), 6).as("vmr"))
        .orderBy(col("s").desc, col("term")).limit(15)
    }),

    // ---- t32: conditional bigram entropy rate per source ----
    "t32_entropy_rate" -> ((s, d) => {
      // guard: Spark's sequence(1, 0) runs DOWNWARD (default step −1), so a
      // 1-char doc would fabricate bigrams; DuckDB's range(1, 1) is empty.
      // split once to a char array and pair by O(1) element_at —
      // substring(text, i, 2) re-scans the string per i (O(n²)/doc,
      // measured 12.7 s → ~1 s at sf0.1)
      val bg = graft.operators.Par.fanOut(
          t(s, d, "documents").select(col("source"), col("text")))
        .filter(length(col("text")) >= 2)
        .select(col("source"), split(col("text"), "").as("cs"))
        .select(col("source"), explode(expr(
          """transform(sequence(1, size(cs) - 1),
             i -> concat(element_at(cs, i), element_at(cs, i + 1)))"""))
          .as("bg"))
        .groupBy("source", "bg").agg(count(lit(1)).as("c"))
        // alphabet²-bounded relation with THREE consumers (ctx, tot, the
        // join) — materialize once so the corpus-sized explode scan
        // underneath runs once, not three times
        .localCheckpoint()
      val ctx = bg.select(col("source"), substring(col("bg"), 1, 1).as("x"),
          col("c"))
        .groupBy("source", "x").agg(sum("c").as("cx"))
      val tot = bg.groupBy("source").agg(sum("c").as("n"),
        count(lit(1)).as("n_bigrams"))
      bg.withColumn("x", substring(col("bg"), 1, 1))
        .join(ctx, Seq("source", "x"))
        .join(tot, "source")
        .groupBy(col("source"), col("n"), col("n_bigrams"))
        .agg(aggregate(
          sort_array(collect_list(struct(col("bg"), col("c"), col("cx")))),
          lit(0.0),
          (acc, s0) => {
            val p = s0.getField("c").cast("double") / col("n").cast("double")
            acc - p * log(s0.getField("c").cast("double") /
              s0.getField("cx").cast("double"))
          }).as("nats"))
        .select(col("source"), col("n").as("n_pairs"), col("n_bigrams"),
          round(col("nats"), 6).as("h_cond_nats"),
          round(col("nats") / log(lit(2.0)), 6).as("h_cond_bits"))
        .orderBy("source")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "t31_term_burstiness" ->
      """WITH dd AS (SELECT CAST(count(*) AS BIGINT) AS dd FROM documents),
         tc AS (
           SELECT doc_id, t.term, CAST(count(*) AS BIGINT) AS c
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents) t
           WHERE len(t.term) > 0 GROUP BY doc_id, t.term),
         per AS (
           SELECT term, CAST(count(*) AS BIGINT) AS df,
             CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS q
           FROM tc GROUP BY term)
         SELECT term, df, s,
           round(CAST(dd * q - s * s AS DOUBLE)
             / CAST(dd * s AS DOUBLE), 6) AS vmr
         FROM per CROSS JOIN dd
         ORDER BY s DESC, term LIMIT 15""",
    "t32_entropy_rate" ->
      """WITH bg AS (
           SELECT source, b.bg, CAST(count(*) AS BIGINT) AS c
           FROM (SELECT source,
                   unnest([text[i:i+1] FOR i IN range(1, len(text))]) AS bg
                 FROM documents WHERE len(text) >= 2) b
           GROUP BY source, b.bg),
         ctx AS (
           SELECT source, bg[1:1] AS x, CAST(sum(c) AS BIGINT) AS cx
           FROM bg GROUP BY source, bg[1:1]),
         tot AS (
           SELECT source, CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_bigrams
           FROM bg GROUP BY source),
         folded AS (
           SELECT bg.source,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(
                 list_sort(list(struct_pack(bg := bg.bg, c := bg.c,
                   cx := ctx.cx))),
                 s -> -(CAST(s.c AS DOUBLE) / tot.n)
                   * ln(CAST(s.c AS DOUBLE) / CAST(s.cx AS DOUBLE)))),
               (a, b) -> a + b) AS nats
           FROM bg JOIN ctx ON bg.source = ctx.source AND bg.bg[1:1] = ctx.x
           JOIN tot ON bg.source = tot.source
           GROUP BY bg.source, tot.n)
         SELECT folded.source, tot.n AS n_pairs, tot.n_bigrams,
           round(nats, 6) AS h_cond_nats,
           round(nats / ln(2.0), 6) AS h_cond_bits
         FROM folded JOIN tot ON folded.source = tot.source
         ORDER BY folded.source"""
  )
}
