package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-8 batch 122: the context-length planning sweep and the
  * character-trigram language distance matrix.
  *
  *  - tp41_maxlen_sweep: the truncation-vs-padding tradeoff curve for
  *    the boundary-respecting one-doc-one-sequence regime — for
  *    max_len ∈ {128, 256, 512, 1024}: tokens kept (min(n, L) per
  *    doc), tokens lost to truncation, padding to fill each sequence
  *    to L, and utilization = kept/(docs·L). Small L wastes tail
  *    tokens, large L wastes padding; this sweep is the artifact a
  *    pretraining config picks max_len from (tp33 plans batches WITHIN
  *    a chosen length; this chooses the length). One scan → per-doc
  *    token count → a 4-row broadcast cross → one aggregate per L;
  *    every cell is an exact BIGINT, utilization one division.
  *  - t37_lang_trigram_distance: cosine similarity between languages'
  *    character-trigram count profiles (the Cavnar–Trenkle n-gram
  *    profile idea with an exact algebraic distance) — dot products
  *    and norms are EXACT integer sums over the (gram)-keyed join
  *    (order-free — no float fold), one sqrt-divide per language pair.
  *    The language-similarity screen behind t3's marker-word
  *    identifier: which languages will confuse a cheap classifier.
  *
  * Scale shape: tp41 is scan → hash agg → 4-row broadcast cross →
  * hash agg; t37's only corpus-proportional pass is the trigram
  * explode → (lang, gram) hash agg; the pair join is keyed on gram
  * with ≤|langs| fan-out per gram and the matrix is |langs|²-bounded.
  *
  * Reference context: no counterpart; extends the training-pipeline
  * planning layer (tp33/tp34) and the text-forensics layer (t28, t36).
  */
object Extended122 {
  type Q = (SparkSession, String) => DataFrame

  private val MaxLens = Seq(128, 256, 512, 1024)

  val queries: Map[String, Q] = Map(
    // ---- tp41: max_len truncation/padding tradeoff sweep ----
    "tp41_maxlen_sweep" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(size(split(col("text"), " ")).cast("long").as("nw"))
      val ls = s.range(1)
        .select(explode(array(MaxLens.map(l => lit(l.toLong)): _*)).as("l"))
      docs.crossJoin(broadcast(ls))
        .select(col("l"),
          col("nw"),
          least(col("nw"), col("l")).as("kept"),
          greatest(col("nw") - col("l"), lit(0L)).as("lost"))
        .groupBy("l")
        .agg(count(lit(1)).as("n_docs"),
          sum("nw").as("total_tokens"),
          sum("kept").as("kept_tokens"),
          sum("lost").as("truncated_tokens"))
        .select(col("l").as("max_len"), col("n_docs"), col("total_tokens"),
          col("kept_tokens"), col("truncated_tokens"),
          (col("n_docs") * col("l") - col("kept_tokens"))
            .as("padding_tokens"),
          round(col("kept_tokens").cast("double") /
            (col("n_docs") * col("l")).cast("double"), 6).as("utilization"))
        .orderBy("max_len")
    }),

    // ---- t37: character-trigram cosine between languages ----
    "t37_lang_trigram_distance" -> ((s, d) => {
      // NOTE: Spark's sequence(1, 0) counts DOWN — short texts must hit
      // the empty-array branch, not a descending range
      // fanout: the trigram explode is the CPU center and the single-file
      // scan gives it one split; split once to a char array so each gram
      // is O(1) element_at instead of substring's O(n) re-scan (the t32
      // discipline); checkpoint the lang×gram counts — THREE consumers
      // (norms + both self-join sides) otherwise re-run the corpus explode
      val grams = graft.operators.Par.fanOut(
          t(s, d, "documents").select(col("lang"), col("text")))
        .filter(length(col("text")) >= 3)
        .select(col("lang"), split(col("text"), "").as("cs"))
        .select(col("lang"), explode(expr(
          """transform(sequence(1, size(cs) - 2),
             i -> concat(element_at(cs, i), element_at(cs, i + 1),
                         element_at(cs, i + 2)))""")).as("g"))
        .groupBy("lang", "g").agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val norms = grams.groupBy("lang")
        .agg(sum(col("c").cast("decimal(38,0)") * col("c")).as("nrm"))
      val dots = grams.as("x").join(grams.as("y"),
          col("x.g") === col("y.g") && col("x.lang") < col("y.lang"))
        .groupBy(col("x.lang").as("lang_a"), col("y.lang").as("lang_b"))
        .agg(sum(col("x.c").cast("decimal(38,0)") * col("y.c")).as("dot"))
      dots
        .join(norms.select(col("lang").as("lang_a"), col("nrm").as("na")),
          "lang_a")
        .join(norms.select(col("lang").as("lang_b"), col("nrm").as("nb")),
          "lang_b")
        .select(col("lang_a"), col("lang_b"),
          round(col("dot").cast("double") /
            sqrt((col("na") * col("nb")).cast("double")), 6).as("cosine"))
        .orderBy("lang_a", "lang_b")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "tp41_maxlen_sweep" ->
      s"""WITH docs AS (
           SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS nw
           FROM documents),
         ls(l) AS (VALUES ${MaxLens.map(l => s"(CAST($l AS BIGINT))").mkString(", ")}),
         crossed AS (
           SELECT l, nw, least(nw, l) AS kept,
             greatest(nw - l, 0) AS lost
           FROM docs CROSS JOIN ls)
         SELECT l AS max_len, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nw) AS BIGINT) AS total_tokens,
           CAST(sum(kept) AS BIGINT) AS kept_tokens,
           CAST(sum(lost) AS BIGINT) AS truncated_tokens,
           CAST(count(*) * l - sum(kept) AS BIGINT) AS padding_tokens,
           round(CAST(sum(kept) AS DOUBLE)
             / CAST(count(*) * l AS DOUBLE), 6) AS utilization
         FROM crossed GROUP BY l ORDER BY max_len""",
    "t37_lang_trigram_distance" ->
      """WITH g AS (
           SELECT lang, substr(text, i, 3) AS g
           FROM documents, LATERAL (
             SELECT unnest(range(1, greatest(len(text) - 2, 0) + 1)) AS i) r),
         cnt AS (
           SELECT lang, g, CAST(count(*) AS BIGINT) AS c
           FROM g GROUP BY lang, g),
         norms AS (
           SELECT lang, sum(CAST(c AS HUGEINT) * c) AS nrm
           FROM cnt GROUP BY lang),
         dots AS (
           SELECT x.lang AS lang_a, y.lang AS lang_b,
             sum(CAST(x.c AS HUGEINT) * y.c) AS dot
           FROM cnt x JOIN cnt y ON x.g = y.g AND x.lang < y.lang
           GROUP BY x.lang, y.lang)
         SELECT d.lang_a, d.lang_b,
           round(CAST(d.dot AS DOUBLE)
             / sqrt(CAST(na.nrm * nb.nrm AS DOUBLE)), 6) AS cosine
         FROM dots d
         JOIN norms na ON na.lang = d.lang_a
         JOIN norms nb ON nb.lang = d.lang_b
         ORDER BY lang_a, lang_b"""
  )
}
