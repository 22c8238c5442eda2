package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.llm.Multimodal

/** Round-8 batch 119: the audio energy contour and Burrows' Delta
  * stylometry.
  *
  *  - mm10_audio_energy: channel-0 RMS-energy contour over REAL WAV
  *    decode — 16-frame windows, per window the exact integer Σs² and
  *    peak |s| (RMS is the one terminal sqrt-divide). This is the
  *    VAD / loudness-normalization building block a speech curation
  *    pipeline runs before segmenting; mm6 measures whole clips, this
  *    is the windowed view. The oracle restates every window from the
  *    splitmix64 generation stream with NO codec (the mm2/mm6
  *    discipline — channel 0 of frame f is flat sample index f·ch), so
  *    a stub decoder cannot match.
  *  - t36_burrows_delta: Burrows' Delta (public stylometry measure:
  *    Burrows 2002) between source pairs — per source, relative
  *    frequencies of the top-30 corpus words; per word, mean/std
  *    across the k sources; z-scores; Delta(s1, s2) = mean |z₁ − z₂|.
  *    The "same author/template?" screen for cross-source
  *    contamination. Counts are exact BIGINTs; f is one division per
  *    cell; μ/σ come from Σf and Σf² FOLDED OVER THE SOURCE-SORTED
  *    list per word, the pair delta folds over the WORD-SORTED list —
  *    both the t35/a46 discipline, so no float order can drift. Words
  *    with σ = 0 are excluded identically on both engines.
  *
  * Scale shape: mm10 is mapPartitions decode, rows flat-mapped, zero
  * shuffle; t36's corpus-proportional work is one explode → hash agg —
  * the matrix, the moments and the pair deltas live on the bounded
  * 30-word × k-source artifact.
  *
  * Reference context: no counterpart; extends the multimodal family
  * (mm6 → windowed) and the text-forensics layer (t8 contamination,
  * t26 source overlap, tp37 OOV).
  */
object Extended119 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- mm10: windowed RMS energy over real decode ----
    "mm10_audio_energy" -> ((s, d) => {
      val media = Multimodal.synthesizeAudio(t(s, d, "documents"), "doc_id")
      Multimodal.extractAudioEnergy(media)
        .select(col("media_id"), col("win"), col("n_samples"),
          col("sum_sq"), col("peak_abs"),
          round(sqrt(col("sum_sq").cast("double") /
            col("n_samples").cast("double")), 4).as("rms"))
        .orderBy("media_id", "win")
    }),

    // ---- t36: Burrows' Delta between sources ----
    "t36_burrows_delta" -> ((s, d) => {
      val toks = t(s, d, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
      val srcTot = toks.groupBy("source").agg(count(lit(1)).as("tot"))
      val top = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w")).limit(30).select("w")
      val cnts = toks.join(broadcast(top), Seq("w"), "left_semi")
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
      val dense = srcTot.crossJoin(broadcast(top))
        .join(cnts, Seq("source", "w"), "left")
        .select(col("source"), col("w"),
          (coalesce(col("c"), lit(0L)).cast("double") /
            col("tot").cast("double")).as("f"))
      // per-word moments folded over the source-sorted share list
      val stats = dense.groupBy("w").agg(
          count(lit(1)).as("k"),
          aggregate(sort_array(collect_list(struct(col("source"), col("f")))),
            struct(lit(0.0).as("sf"), lit(0.0).as("sff")),
            (acc, x) => struct((acc("sf") + x("f")).as("sf"),
              (acc("sff") + x("f") * x("f")).as("sff"))).as("m"))
        .select(col("w"),
          (col("m.sf") / col("k").cast("double")).as("mu"),
          sqrt(col("m.sff") / col("k").cast("double") -
            (col("m.sf") / col("k").cast("double")) *
              (col("m.sf") / col("k").cast("double"))).as("sigma"))
        .filter(col("sigma") > 0.0)
      val z = dense.join(broadcast(stats), "w")
        .select(col("source"), col("w"),
          ((col("f") - col("mu")) / col("sigma")).as("z"))
      z.as("a").join(z.as("b"),
          col("a.w") === col("b.w") && col("a.source") < col("b.source"))
        .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
          col("a.w").as("w"), abs(col("a.z") - col("b.z")).as("dz"))
        .groupBy("src_a", "src_b")
        .agg(count(lit(1)).as("n_words"),
          aggregate(sort_array(collect_list(struct(col("w"), col("dz")))),
            lit(0.0), (acc, x) => acc + x("dz")).as("sumdz"))
        .select(col("src_a"), col("src_b"), col("n_words"),
          round(col("sumdz") / col("n_words").cast("double"), 6).as("delta"))
        .orderBy("src_a", "src_b")
    })
  )

  val oracleSql: Map[String, String] = {
    import OracleSql.splitmixList
    Map(
      "mm10_audio_energy" -> {
        val seeds =
          "list_transform(range(lo, hi), f -> (doc_id*999983 + f*ch)::HUGEINT)"
        s"""WITH d AS (
             SELECT doc_id, (40 + doc_id % 30)::BIGINT AS n,
               (1 + (doc_id // 3) % 2)::BIGINT AS ch
             FROM documents),
           wins AS (
             SELECT doc_id, n, ch, unnest(range(0, (n + 15) // 16)) AS w
             FROM d),
           bounds AS (
             SELECT doc_id, ch, w, w * 16 AS lo, least(w * 16 + 16, n) AS hi
             FROM wins),
           samp AS (
             SELECT doc_id, w, hi - lo AS n_samples,
               list_transform(${splitmixList(seeds)},
                 z -> (z % 65536 - 32768)::BIGINT) AS ss
             FROM bounds),
           agg AS (
             SELECT doc_id, w, n_samples,
               CAST(list_aggregate(list_transform(ss, x -> x * x), 'sum')
                 AS BIGINT) AS sum_sq,
               CAST(list_aggregate(list_transform(ss, x -> abs(x)), 'max')
                 AS BIGINT) AS peak_abs
             FROM samp)
           SELECT doc_id AS media_id, w::INT AS win, n_samples, sum_sq,
             peak_abs,
             round(sqrt(CAST(sum_sq AS DOUBLE) / CAST(n_samples AS DOUBLE)),
               4) AS rms
           FROM agg ORDER BY media_id, win""" },
      "t36_burrows_delta" ->
        """WITH toks AS (
             SELECT source, unnest(string_split(text, ' ')) AS w
             FROM documents),
           tk AS (SELECT source, w FROM toks WHERE length(w) > 0),
           src_tot AS (
             SELECT source, CAST(count(*) AS BIGINT) AS tot
             FROM tk GROUP BY source),
           top AS (
             SELECT w FROM (
               SELECT w, count(*) AS cnt FROM tk GROUP BY w
               ORDER BY cnt DESC, w LIMIT 30)),
           cnts AS (
             SELECT source, w, CAST(count(*) AS BIGINT) AS c
             FROM tk WHERE w IN (SELECT w FROM top)
             GROUP BY source, w),
           dense AS (
             SELECT st.source, t.w,
               CAST(COALESCE(c.c, 0) AS DOUBLE) / CAST(st.tot AS DOUBLE) AS f
             FROM src_tot st CROSS JOIN top t
             LEFT JOIN cnts c ON c.source = st.source AND c.w = t.w),
           stats AS (
             SELECT w, CAST(count(*) AS BIGINT) AS k,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list(f ORDER BY source)), (a, b) -> a + b) AS sf,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list(f * f ORDER BY source)), (a, b) -> a + b) AS sff
             FROM dense GROUP BY w),
           moments AS (
             SELECT w, sf / CAST(k AS DOUBLE) AS mu,
               sqrt(sff / CAST(k AS DOUBLE)
                 - (sf / CAST(k AS DOUBLE)) * (sf / CAST(k AS DOUBLE)))
                 AS sigma
             FROM stats),
           usable AS (SELECT * FROM moments WHERE sigma > 0),
           z AS (
             SELECT d.source, d.w, (d.f - m.mu) / m.sigma AS z
             FROM dense d JOIN usable m ON d.w = m.w),
           pairs AS (
             SELECT a.source AS src_a, b.source AS src_b, a.w,
               abs(a.z - b.z) AS dz
             FROM z a JOIN z b ON a.w = b.w AND a.source < b.source)
           SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_words,
             round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list(dz ORDER BY w)), (a, b) -> a + b)
               / CAST(count(*) AS DOUBLE), 6) AS delta
           FROM pairs GROUP BY src_a, src_b ORDER BY src_a, src_b"""
    )
  }
}
