package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.llm.{Dedup, Multimodal}

/** Round-7 batch 79: estimator calibration for the MinHash sketch, and
  * time-domain DSP over really-decoded audio.
  *
  *  - t27_minhash_calibration: how good is the 64-hash MinHash estimate
  *    of Jaccard, measured on the engine's OWN LSH candidate pairs? Per
  *    exact-Jaccard decile: pair count, the mean estimated similarity
  *    (signature agreement fraction — sums of k/64 dyadic rationals are
  *    EXACT in binary doubles, so the mean is order-independent), the
  *    over/under-estimate counts, and the worst absolute error. The
  *    integer spine: agreement counts and intersection sizes are exact
  *    ints; only the terminal divisions are floats. This is the query
  *    that justifies (or indicts) the bands×rows choice before a 100 TB
  *    dedup run.
  *  - mm6_audio_dsp: zero-crossing count (channel 0), peak |amplitude|
  *    and near-silence sample count over REALLY decoded WAV/PCM frames
  *    (JDK javax.sound codec, same honesty contract as mm4: the decoded
  *    stream must reproduce the generation stream sample-exactly, which
  *    the oracle restates with no codec). All three statistics are
  *    exact integers; the two rates are one division each.
  *
  * Scale shape: t27 rides the banded LSH join (never all pairs) and one
  * grouped aggregate; mm6 is mapPartitions decode — one codec instance
  * per partition, no shuffle.
  *
  * Reference context: no counterpart; extends the dedup family with the
  * estimator-quality view and the multimodal family with real DSP.
  */
object Extended79 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "t27_minhash_calibration" -> ((s, d) => {
      val docs = graft.operators.Par.fanOut(t(s, d, "documents"))
      val buckets = Dedup.lshBuckets(docs, "doc_id", "text")
      val ba = buckets.toDF("a", "band", "bucket")
      val bb = buckets.toDF("b", "band", "bucket")
      val cand = ba.join(bb, Seq("band", "bucket")).filter(col("a") < col("b"))
        .select("a", "b").distinct()
      // signatures + shingle sets computed once, fed to both pair sides
      val sigs = docs.select(col("doc_id"),
          Dedup.minhashSignature(col("text")).as("sig"),
          Dedup.shingles(col("text"), 2).as("sh"))
        .localCheckpoint()
      val withSides = cand
        .join(sigs.toDF("a", "sig_a", "sh_a"), "a")
        .join(sigs.toDF("b", "sig_b", "sh_b"), "b")
      val matches = aggregate(
        zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1L).otherwise(0L)),
        lit(0L), (acc, e) => acc + e)
      val inter = size(array_intersect(col("sh_a"), col("sh_b")))
      val scored = withSides.select(
          matches.as("m"),
          inter.as("inter"),
          (size(col("sh_a")) + size(col("sh_b")) - inter).as("uni"))
        .select(col("m"),
          when(col("uni") === 0, 1.0)
            .otherwise(col("inter").cast("double") / col("uni")).as("exact"))
        .select(col("m"), col("exact"),
          (col("m").cast("double") / 64.0).as("est"))
      scored
        .select(least(floor(col("exact") * 10.0), lit(9.0)).cast("long")
            .as("decile"),
          col("m"), col("est"), col("exact"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_pairs"),
          sum("m").as("sum_m"),
          sum(when(col("est") > col("exact"), 1L).otherwise(0L)).as("n_over"),
          sum(when(col("est") < col("exact"), 1L).otherwise(0L)).as("n_under"),
          max(abs(col("est") - col("exact"))).as("mae"))
        .select(col("decile"), col("n_pairs"),
          round(col("sum_m").cast("double") / (col("n_pairs") * 64L).cast("double"), 6)
            .as("mean_est"),
          col("n_over"), col("n_under"),
          round(col("mae"), 6).as("max_abs_err"))
        .orderBy("decile")
    }),

    "mm6_audio_dsp" -> ((s, d) => {
      val media = Multimodal.synthesizeAudio(t(s, d, "documents"), "doc_id")
      Multimodal.extractAudioDsp(media)
        .select(col("media_id"), col("sample_rate"), col("channels"),
          col("n_frames"), col("zero_crossings"), col("peak_abs"),
          col("n_silent"),
          round(col("zero_crossings").cast("double") /
            (col("n_frames") - 1).cast("double"), 6).as("zcr"),
          round(col("n_silent").cast("double") /
            (col("n_frames") * col("channels")).cast("double"), 6)
            .as("silent_ratio"))
        .orderBy("media_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "t27_minhash_calibration" ->
      s"""WITH ${LlmQueries.minhashSigCtes},
         cand AS (
           SELECT DISTINCT x1.doc_id AS a, x2.doc_id AS b
           FROM kb x1 JOIN kb x2
             ON x1.band = x2.band AND x1.key = x2.key AND x1.doc_id < x2.doc_id),
         scored AS (
           SELECT
             len([i FOR i IN range(1, 65)
                  IF sa.sig[i] = sb.sig[i]])::BIGINT AS m,
             CASE WHEN len(ga.grams) + len(gb.grams) = 0 THEN 1.0
               ELSE len(list_intersect(ga.grams, gb.grams)) /
                 CAST(len(ga.grams) + len(gb.grams)
                      - len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
               END AS exact
           FROM cand
             JOIN sg sa ON sa.doc_id = cand.a
             JOIN sg sb ON sb.doc_id = cand.b
             JOIN g ga ON ga.doc_id = cand.a
             JOIN g gb ON gb.doc_id = cand.b),
         e AS (
           SELECT m, exact, CAST(m AS DOUBLE) / 64.0 AS est,
             CAST(least(floor(exact * 10.0), 9.0) AS BIGINT) AS decile
           FROM scored)
         SELECT decile, CAST(count(*) AS BIGINT) AS n_pairs,
           round(CAST(sum(m) AS DOUBLE) / (count(*) * 64), 6) AS mean_est,
           CAST(sum(CASE WHEN est > exact THEN 1 ELSE 0 END) AS BIGINT) AS n_over,
           CAST(sum(CASE WHEN est < exact THEN 1 ELSE 0 END) AS BIGINT) AS n_under,
           round(max(abs(est - exact)), 6) AS max_abs_err
         FROM e GROUP BY decile ORDER BY decile""",
    "mm6_audio_dsp" -> {
      import OracleSql.splitmixList
      val seeds = "list_transform(range(0, n*ch), i -> (doc_id*999983 + i)::HUGEINT)"
      s"""WITH d AS (
           SELECT doc_id, 8000*(1 + doc_id % 3) AS rate,
             1 + (doc_id // 3) % 2 AS ch, 40 + doc_id % 30 AS n
           FROM documents),
         sm AS (
           SELECT doc_id, rate, ch, n,
             list_transform(${splitmixList(seeds)}, z -> (z % 65536 - 32768)::BIGINT) AS vals
           FROM d),
         c AS (
           SELECT doc_id, rate, ch, n, vals,
             [vals[i] FOR i IN range(1, len(vals) + 1) IF (i - 1) % ch = 0] AS c0
           FROM sm),
         st AS (
           SELECT doc_id, rate, ch, n,
             len([i FOR i IN range(2, len(c0) + 1)
                  IF (c0[i] < 0) <> (c0[i-1] < 0)])::BIGINT AS zc,
             list_aggregate(list_transform(vals, v -> abs(v)), 'max')::BIGINT AS peak,
             len(list_filter(vals, v -> abs(v) < 1024))::BIGINT AS silent
           FROM c)
         SELECT doc_id AS media_id, rate::INT AS sample_rate,
           ch::INT AS channels, n::BIGINT AS n_frames,
           zc AS zero_crossings, peak AS peak_abs, silent AS n_silent,
           round(CAST(zc AS DOUBLE) / (n - 1), 6) AS zcr,
           round(CAST(silent AS DOUBLE) / (n * ch), 6) AS silent_ratio
         FROM st ORDER BY media_id"""
    }
  )
}
