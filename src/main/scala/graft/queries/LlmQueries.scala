package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.llm.{Dedup, Multimodal, Similarity, Text}

/** LLM-data-pipeline operators over the synthetic documents/embeddings
  * tables. Every query here carries a bit-exact DuckDB oracle — including
  * the sketch-based ones (minhash/simhash/LSH/IVF), whose hash kernels are
  * deliberately built from splitmix64∘polyHash so the oracle can emulate
  * them in HUGEINT arithmetic (see OracleSql). Behavioral properties
  * (planted duplicates, ANN recall) are additionally covered in LlmSpec.
  */
object LlmQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- text analysis ----
    "t1_token_count" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), Text.tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id")),
    "t2_quality_score" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        Text.tokenCount(col("text")).as("n_tokens"),
        round(Text.meanWordLen(col("text")), 4).as("mean_word_len"),
        round(Text.stopwordRatio(col("text")), 4).as("stopword_ratio"),
        round(Text.qualityScore(col("text")), 2).as("quality"))
        .orderBy("doc_id")),
    "t6_bpe_count" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), Text.approxBpeCount(col("text")).as("n_bpe"))
        .orderBy("doc_id")),
    "t3_lang_id" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), Text.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")),
    "t4_fingerprint" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),
    "t5_rolling_fingerprint" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          Text.rollingFingerprint(col("text"), 3).as("rfp"))
        .orderBy("doc_id")),

    // ---- deduplication ----
    "dedup_exact" -> ((s, d) =>
      Dedup.exact(t(s, d, "documents"), "doc_id", "text")
        .select("doc_id").orderBy("doc_id")),
    "dedup_ngram_jaccard" -> ((s, d) => {
      // exact top-20: striped-triangle bitset kernel with per-task bounded
      // heaps — no O(n²)-row join materialization (Dedup.ngramJaccardTopK)
      val pairs = Dedup.ngramJaccardTopK(t(s, d, "documents"), "doc_id", "text", 20, 2)
      pairs.select(col("a"), col("b"), round(col("jaccard"), 4).as("jac"))
        .orderBy(col("jac").desc, col("a"), col("b")).limit(20)
    }),
    "dedup_minhash_lsh" -> ((s, d) =>
      Dedup.lshBuckets(t(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id", "band")),
    "dedup_simhash" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), Dedup.simhashUdf(col("text")).as("simhash"))
        .orderBy("doc_id")),
    // full pipeline: LSH pairs → verified edges → connected components →
    // representatives + singletons
    "dedup_near_pipeline" -> ((s, d) =>
      Dedup.dedupNear(t(s, d, "documents"), "doc_id", "text", threshold = 0.8)
        .select("doc_id").orderBy("doc_id")),
    "dedup_embedding_cosine" -> ((s, d) =>
      Similarity.topSimilarPairs(t(s, d, "embeddings"), "vec_id", "embedding", 20)),

    // ---- similarity search ----
    "ann_brute_topk" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>").as("qv"))
      e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(Similarity.cosine(col("embedding"), col("qv")), 4).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    }),
    // train → persist (AnnStore) → reload → query: the oracle hash on
    // every sweep certifies that an index answered via the saved-then-
    // loaded artifact is bit-identical to the in-memory one — the
    // train-once/query-many contract at 100 TB
    "ann_ivf_topk" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val qv = e.filter(col("vec_id") === 0).select(col("embedding"))
        .head.getSeq[Float](0).map(_.toDouble)
      val rest = e.filter(col("vec_id") =!= 0)
      val idxPath = Scratch.dir("ann_ivf", d)
      graft.store.AnnStore.saveIvf(s,
        Similarity.buildIvfIndex(rest, "vec_id", "embedding",
          nCentroids = 16, trainIters = 2), idxPath)
      Similarity.ivfTopKWith(graft.store.AnnStore.loadIvf(s, idxPath),
        rest, "vec_id", "embedding", qv, 10, nProbe = 6)
        .select(col("vec_id"), round(col("sim"), 4).as("sim"))
    }),
    "ann_lsh_topk" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val qv = e.filter(col("vec_id") === 0).select(col("embedding"))
        .head.getSeq[Float](0).map(_.toDouble)
      Similarity.lshTopK(e.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        qv, 10, qv.length)
        .select(col("vec_id"), round(col("sim"), 4).as("sim"))
    }),

    // ---- multimodal: real JDK PNG codec; schema/batching distributed ----
    "mm1_media_meta" -> ((s, d) => {
      val media = Multimodal.asMedia(t(s, d, "documents"), "doc_id", "text", "text/plain")
      media.select(col("media_id"), octet_length(col("content")).as("byte_len"),
        sha2(col("content"), 256).as("sha"), col("meta.format").as("format"))
        .orderBy("media_id")
    }),
    // REAL decode: a deterministic PNG per document (pixels from the
    // public splitmix64 stream) is encoded through javax.imageio, then
    // decoded back by extractFeatures, which measures the actual pixels.
    // PNG is lossless, so the decoded channel means must equal the means
    // of the generation stream — which is exactly what the oracle computes
    // from doc_id alone. A wrong decoder (or a stub) cannot match it.
    "mm2_decode_features" -> ((s, d) => {
      val media = Multimodal.synthesizeImages(t(s, d, "documents"), "doc_id")
      Multimodal.extractFeatures(media)
        .select(col("media_id"), col("width"), col("height"), col("channels"),
          round(element_at(col("features"), 1), 4).as("f_all"),
          round(element_at(col("features"), 2), 4).as("f_r"),
          round(element_at(col("features"), 3), 4).as("f_g"),
          round(element_at(col("features"), 4), 4).as("f_b"))
        .orderBy("media_id")
    }),
    "mm3_frame_plan" -> ((s, d) => {
      val media = Multimodal.asMedia(t(s, d, "documents"), "doc_id", "text", "video/fake")
        .withColumn("meta", struct(col("meta.format"), col("meta.width"),
          col("meta.height"),
          (octet_length(col("content")).cast("long") * 10).as("duration_ms")))
      Multimodal.frameSamplePlan(media, 500L).orderBy("media_id", "frame_ts_ms")
    }),
    // ---- audio: REAL RIFF/WAVE encode → javax.sound decode → features ----
    // Same honesty contract as mm2: the PCM stream is generated from
    // doc_id via the public splitmix64 stream, really encoded as WAV,
    // really decoded by the JDK audio codec; the amplitude statistics of
    // the decoded frames must equal those of the generation stream, which
    // the oracle restates with no codec. floor(x*1e6+0.5)/1e6 is the
    // cross-engine-stable 6-dp rounding (Spark round() HALF_UPs BigDecimal
    // ties that DuckDB's double round misses).
    "mm4_audio_decode" -> ((s, d) => {
      def r6(c: org.apache.spark.sql.Column) =
        floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
      val media = Multimodal.synthesizeAudio(t(s, d, "documents"), "doc_id")
      Multimodal.extractAudioFeatures(media)
        .select(col("media_id"), col("sample_rate"), col("channels"),
          col("n_frames"),
          r6(element_at(col("features"), 1)).as("mean_amp"),
          r6(element_at(col("features"), 2)).as("rms"),
          r6(element_at(col("features"), 3)).as("mean_c0"))
        .orderBy("media_id")
    })
  )

  import OracleSql._

  /** Shared CTE prefix computing the 64-hash MinHash signature and the 16
    * per-band keys for every document — the bit-exact SQL replica of
    * Dedup.minhashSignatureScala + lshBuckets (coefficients interpolated
    * from Dedup.hashCoeffs so the two implementations cannot drift).
    * Defines CTEs: w (words), g (distinct 2-gram shingles), hx (32-bit
    * mixed shingle hashes), sg (signature), kb (band → key string).
    */
  private[queries] def minhashSigCtes: String = {
    val (as, bs) = Dedup.hashCoeffs(64)
    s"""w AS (
         SELECT doc_id,
           coalesce(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                x -> x <> ''), []) AS ws
         FROM documents),
       g AS (
         SELECT doc_id, CASE WHEN len(ws) < 2 THEN []::VARCHAR[]
           ELSE list_distinct([ws[i] || ' ' || ws[i+1] FOR i IN range(1, len(ws))])
           END AS grams
         FROM w),
       hx AS (
         SELECT doc_id, grams,
           list_transform(${mixHashList("grams")}, h -> (h % 4294967296)::BIGINT) AS xs
         FROM g),
       sg AS (
         SELECT doc_id, grams,
           list_transform(range(64), i ->
             CASE WHEN len(xs) = 0 THEN 9223372036854775807
                  ELSE list_aggregate(list_transform(xs, x ->
                         ((${longList(as.toSeq)})[i+1]*x + (${longList(bs.toSeq)})[i+1])
                           % 4294967311), 'min') END) AS sig
         FROM hx),
       kb AS (
         SELECT doc_id, grams, bb.band AS band,
           bb.band::VARCHAR || '_' ||
             array_to_string(list_slice(sig, bb.band*4+1, bb.band*4+4), ',') AS key
         FROM sg CROSS JOIN (SELECT unnest(range(16)) AS band) bb)"""
  }

  val oracleSql: Map[String, String] = Map(
    // 64-bit SimHash replicated bit-exactly: word list → mixHash (splitmix64
    // ∘ polyHash, HUGEINT mod-2^64 emulation) → per-bit majority vote →
    // signed 64-bit reassembly
    "dedup_simhash" ->
      s"""WITH w AS (
           SELECT doc_id,
             coalesce(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                                  x -> x <> ''), []) AS ws
           FROM documents),
         h AS (SELECT doc_id, ${mixHashList("ws")} AS hs FROM w),
         b AS (
           SELECT doc_id, pw,
             len(list_filter(hs, x -> (x // pw) % 2 = 1)) * 2 - len(hs) AS score
           FROM h CROSS JOIN (VALUES $bitPowerValues) bits(pw))
         SELECT doc_id, ${toSigned("sm")} AS simhash
         FROM (SELECT doc_id,
                 sum(CASE WHEN score > 0 THEN pw ELSE 0::HUGEINT END) AS sm
               FROM b GROUP BY doc_id)
         ORDER BY doc_id""",
    // MinHash signature + LSH band buckets, bit-exact (bucket = polyHash of
    // the "band_sig,sig,.." string, signed)
    "dedup_minhash_lsh" ->
      s"""WITH $minhashSigCtes
         SELECT doc_id, band::INT AS band, ${toSigned(polyHashScalar("key"))} AS bucket
         FROM kb ORDER BY doc_id, band""",
    // Full near-dedup pipeline: band-key-equality candidates (== bucket
    // equality modulo 64-bit hash collisions) → exact Jaccard >= 0.8 verify
    // → connected components via recursive closure → keep min-id
    // representative per component plus all unpaired docs
    "dedup_near_pipeline" ->
      s"""WITH RECURSIVE $minhashSigCtes,
         cand AS (
           SELECT DISTINCT x1.doc_id AS a, x2.doc_id AS b
           FROM kb x1 JOIN kb x2
             ON x1.band = x2.band AND x1.key = x2.key AND x1.doc_id < x2.doc_id),
         ver AS (
           SELECT cand.a, cand.b FROM cand
             JOIN g ga ON ga.doc_id = cand.a
             JOIN g gb ON gb.doc_id = cand.b
           WHERE CASE WHEN len(ga.grams) + len(gb.grams) = 0 THEN 1.0
             ELSE len(list_intersect(ga.grams, gb.grams)) /
               CAST(len(ga.grams) + len(gb.grams)
                    - len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
             END >= 0.8),
         sym AS (SELECT a, b FROM ver UNION SELECT b AS a, a AS b FROM ver),
         reach AS (
           SELECT a AS s, b AS t FROM sym
           UNION
           SELECT r.s, e.b FROM reach r JOIN sym e ON r.t = e.a),
         rep AS (SELECT s, least(s, min(t)) AS rep FROM reach GROUP BY s)
         SELECT doc_id FROM documents
         WHERE doc_id NOT IN (SELECT s FROM rep WHERE rep < s)
         ORDER BY doc_id""",
    "t1_token_count" ->
      """SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
         FROM documents ORDER BY doc_id""",
    "t2_quality_score" ->
      s"""WITH w AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws,
                  length(regexp_replace(trim(text), '\\s+', '', 'g')) AS chars
           FROM documents),
         m AS (
           SELECT doc_id, len(ws) AS n_tokens,
             CASE WHEN len(ws) = 0 THEN 0.0 ELSE chars / CAST(len(ws) AS DOUBLE) END AS mwl,
             CASE WHEN len(ws) = 0 THEN 0.0 ELSE
               len(list_filter(ws, x -> x IN (${Text.Stopwords.map("'" + _ + "'").mkString(",")})))
                 / CAST(len(ws) AS DOUBLE) END AS swr,
             CASE WHEN length(trim(text)) = 0 THEN 0.0 ELSE
               (length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')))
                 / CAST(length(text) AS DOUBLE) END AS pr
           FROM documents JOIN w USING (doc_id))
         SELECT doc_id, n_tokens, round(mwl, 4) AS mean_word_len,
           round(swr, 4) AS stopword_ratio,
           round(CASE WHEN pr > 0.5 THEN 0.0 ELSE
                 (CASE WHEN n_tokens BETWEEN 5 AND 5000 THEN 0.4 ELSE 0.0 END) +
                 (CASE WHEN swr BETWEEN 0.01 AND 0.6 THEN 0.3 ELSE 0.0 END) +
                 (CASE WHEN mwl BETWEEN 2.0 AND 12.0 THEN 0.2 ELSE 0.0 END) +
                 (CASE WHEN pr < 0.2 THEN 0.1 ELSE 0.0 END) END, 2) AS quality
         FROM m ORDER BY doc_id""",
    "t6_bpe_count" ->
      """SELECT doc_id,
         CAST(list_aggregate(list_transform(
           regexp_split_to_array(trim(text), '\s+'),
           w -> greatest(CAST(ceil(length(w)/4.0) AS BIGINT), 1)), 'sum') AS BIGINT) AS n_bpe
         FROM documents ORDER BY doc_id""",
    "t4_fingerprint" ->
      """SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
         FROM documents ORDER BY doc_id""",
    "dedup_exact" ->
      """SELECT doc_id FROM (
           SELECT doc_id, min(doc_id) OVER (
             PARTITION BY md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))) AS keep
           FROM documents)
         WHERE doc_id = keep ORDER BY doc_id""",
    // Java's wraparound polynomial hash (h = 31h + c over long overflow)
    // emulated with HUGEINT arithmetic mod 2^64, then min-winnowed over the
    // same word 3-grams as Text.rollingFingerprint; the corpus is
    // ASCII-only so unicode(c) == charAt — an exact replica, not an
    // approximation
    "t5_rolling_fingerprint" ->
      """WITH g AS (
           SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
           FROM documents),
         k AS (
           SELECT doc_id,
             CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                  ELSE [array_to_string(ws[i:i+2], ' ') FOR i IN range(1, len(ws) - 1)]
             END AS grams
           FROM g),
         h AS (
           SELECT doc_id,
             list_transform(grams, s ->
               list_reduce(
                 list_prepend(1125899906842597::HUGEINT,
                   list_transform(range(1, length(s) + 1), i -> unicode(s[i:i])::HUGEINT)),
                 (a, b) -> (31 * a + b) % 18446744073709551616::HUGEINT)) AS hs
           FROM k)
         SELECT doc_id,
           CAST(CASE WHEN m >= 9223372036854775808::HUGEINT
                     THEN m - 18446744073709551616::HUGEINT ELSE m END AS BIGINT) AS rfp
         FROM (SELECT doc_id, list_aggregate(
             list_transform(hs, x -> CASE WHEN x >= 9223372036854775808::HUGEINT
                     THEN x - 18446744073709551616::HUGEINT ELSE x END), 'min') AS m
           FROM h)
         ORDER BY doc_id""",
    // the marker-word heuristic replicated in SQL, marker lists interpolated
    // from Text.Markers so the two implementations cannot drift; tie-break =
    // alphabetically-first max, exactly the UDF's sortBy((-score, lang))
    "t3_lang_id" -> {
      def marks(lang: String) =
        Text.Markers(lang).toSeq.sorted.map("'" + _ + "'").mkString(",")
      s"""WITH w AS (
           SELECT doc_id, text,
             length(regexp_replace(text, '[^\\x{4E00}-\\x{9FFF}]', '', 'g')) AS cjk,
             list_filter(regexp_split_to_array(lower(text), '[^\\pL]+'), x -> x <> '') AS ws
           FROM documents),
         s AS (
           SELECT doc_id, text, cjk, ws,
             len(list_filter(ws, x -> x IN (${marks("en")}))) AS s_en,
             len(list_filter(ws, x -> x IN (${marks("de")}))) AS s_de,
             len(list_filter(ws, x -> x IN (${marks("es")}))) AS s_es,
             len(list_filter(ws, x -> x IN (${marks("fr")}))) AS s_fr
           FROM w)
         SELECT doc_id,
           CASE WHEN text IS NULL OR text = '' THEN 'und'
                WHEN cjk * 2 >= length(text) THEN 'zh'
                WHEN len(ws) = 0 THEN 'und'
                WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
                WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS lang_pred
         FROM s ORDER BY doc_id"""
    },
    "dedup_ngram_jaccard" ->
      """WITH w AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
         g AS (
           SELECT doc_id,
             list_distinct([ws[i] || ' ' || ws[i+1] FOR i IN range(1, len(ws))]) AS grams
           FROM w),
         s AS (SELECT doc_id, len(grams) AS n, unnest(grams) AS gr FROM g),
         p AS (
           SELECT a.doc_id AS a, b.doc_id AS b, a.n AS na, b.n AS nb, count(*) AS inter
           FROM s a JOIN s b ON a.gr = b.gr AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4)
         SELECT a, b, round(inter / CAST(na + nb - inter AS DOUBLE), 4) AS jac
         FROM p ORDER BY jac DESC, a, b LIMIT 20""",
    // Hyperplane-LSH ANN replicated bit-exactly: signature sign bits use the
    // same ascending-fold dot product (IEEE-identical), plane weights
    // interpolated from Similarity.planeRows; final similarity via DuckDB's
    // cosine (4-dp agreement proven by ann_brute_topk)
    "ann_lsh_topk" -> {
      val planes = Similarity.planeRows(64, 16).map { case (b, w) =>
        s"($b, ${w.map(_.toString).mkString("[", ",", "]")}::DOUBLE[])"
      }.mkString(",")
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                     FROM embeddings WHERE vec_id = 0),
         v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
               FROM embeddings WHERE vec_id <> 0),
         planes(pb, w) AS (VALUES $planes),
         sigs AS (
           SELECT vec_id, CAST(sum(CASE WHEN ${dotFold("ev", "w")} >= 0
                                        THEN 1 << pb ELSE 0 END) AS BIGINT) AS sig
           FROM v CROSS JOIN planes GROUP BY vec_id),
         qs AS (
           SELECT CAST(sum(CASE WHEN ${dotFold("qv", "w")} >= 0
                                THEN 1 << pb ELSE 0 END) AS BIGINT) AS qsig
           FROM q CROSS JOIN planes)
         SELECT v.vec_id, round(list_cosine_similarity(ev, qv), 4) AS sim
         FROM v JOIN sigs USING (vec_id) CROSS JOIN q CROSS JOIN qs
         WHERE bit_count(xor(sig, qsig)) <= 6
         ORDER BY ${cosExact("ev", "qv")} DESC, vec_id LIMIT 10"""
    },
    // IVF ANN replicated, including the k-means training: seed = first 16
    // vectors by id, then TWO Lloyd iterations (Similarity.trainCentroids
    // with trainIters = 2) — assignment = argmax cosine (exact-fold
    // d/sqrt(na*nb), first-max tie-break), update = per-dimension mean of
    // FIXED-POINT values (floor(x*2^24) summed as BIGINT: long sums
    // commute, so the distributed Spark sum and this sequential sum agree
    // bit-for-bit; one double division after), empty clusters keep their
    // previous centroid. Query path: probe the 6 trained centroids nearest
    // the query, exact cosine on the probed subset.
    "ann_ivf_topk" -> {
      def cosF(a: String, b: String) =
        s"${dotFold(a, b)} / sqrt(${dotFold(a, a)} * ${dotFold(b, b)})"
      // one Lloyd iteration: prev centroids -> assignment -> fixed-point
      // per-dimension means -> next centroids
      def lloyd(prev: String, asn: String, upd: String, next: String) =
        s"""$asn AS (SELECT vec_id, cid FROM (
               SELECT vec_id, cid, row_number() OVER (
                 PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
               FROM (SELECT vec_id, cid, ${cosF("ev", "cv")} AS cs
                     FROM v CROSS JOIN $prev)) WHERE rn = 1),
         $upd AS (SELECT cid, p,
               CAST(sum(CAST(floor(ev[p] * 16777216) AS BIGINT)) AS DOUBLE)
                 / count(*) / 16777216.0 AS cvp
             FROM v JOIN $asn USING (vec_id), range(1, 65) AS r(p)
             GROUP BY cid, p),
         $next AS (SELECT $prev.cid, coalesce(u.cv, $prev.cv) AS cv
             FROM $prev LEFT JOIN (
               SELECT cid, list(cvp ORDER BY p) AS cv FROM $upd GROUP BY cid) u
             USING (cid))"""
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
                     FROM embeddings WHERE vec_id <> 0),
         q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id = 0),
         c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, ev AS cv
               FROM (SELECT * FROM v ORDER BY vec_id LIMIT 16)),
         ${lloyd("c0", "a0", "u0", "c1")},
         ${lloyd("c1", "a1", "u1", "c2")},
         ac AS (SELECT vec_id, cid, ${cosF("ev", "cv")} AS cs
                FROM v CROSS JOIN c2),
         asn AS (SELECT vec_id, cid FROM (
                   SELECT vec_id, cid, row_number() OVER (
                     PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn FROM ac)
                 WHERE rn = 1),
         pr AS (SELECT cid FROM (
                  SELECT cid, row_number() OVER (
                    ORDER BY ${cosF("qv", "cv")} DESC, cid) AS rn
                  FROM c2 CROSS JOIN q)
                WHERE rn <= 6)
         SELECT v.vec_id, round(list_cosine_similarity(ev, qv), 4) AS sim
         FROM v JOIN asn USING (vec_id) CROSS JOIN q
         WHERE asn.cid IN (SELECT cid FROM pr)
         ORDER BY ${cosExact("ev", "qv")} DESC, vec_id LIMIT 10"""
    },
    // ORDER BY the bit-exact raw cosine (not the rounded output) so the
    // top-k selection boundary matches the engine's raw ranking
    "dedup_embedding_cosine" ->
      s"""WITH p AS (
           SELECT a.vec_id AS a, b.vec_id AS b,
             CAST(a.embedding AS DOUBLE[]) AS ea,
             CAST(b.embedding AS DOUBLE[]) AS eb
           FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id)
         SELECT a, b, round(list_cosine_similarity(ea, eb), 4) AS sim
         FROM p ORDER BY ${cosExact("ea", "eb")} DESC, a, b LIMIT 20""",
    "ann_brute_topk" ->
      s"""WITH p AS (
           SELECT b.vec_id,
             CAST(a.embedding AS DOUBLE[]) AS qv,
             CAST(b.embedding AS DOUBLE[]) AS ev
           FROM embeddings a, embeddings b
           WHERE a.vec_id = 0 AND b.vec_id <> 0)
         SELECT vec_id, round(list_cosine_similarity(ev, qv), 4) AS sim
         FROM p ORDER BY ${cosExact("ev", "qv")} DESC, vec_id LIMIT 10""",
    "mm1_media_meta" ->
      """SELECT doc_id AS media_id, octet_length(CAST(text AS BLOB)) AS byte_len,
         sha256(text) AS sha, 'text/plain' AS format
         FROM documents ORDER BY media_id""",
    // The REAL decode checked from first principles: the engine encodes
    // pixels v(i) = splitmix64(doc_id*1000003 + i) mod 256 into an actual
    // PNG and decodes it back with javax.imageio; PNG is lossless, so the
    // decoded channel means must equal the means of that generation
    // stream — restated here with no image codec at all. Channel c of
    // pixel p is flat index p*3+c (R,G,B order), i.e. 1-based list
    // position i with (i-1)%3 = c. Sums are exact integers on both
    // engines; one double division each matches bit-for-bit.
    "mm2_decode_features" -> {
      val seeds = "list_transform(range(0, w*h*3), i -> (doc_id*1000003 + i)::HUGEINT)"
      def chanSum(c: Int) =
        s"list_aggregate([vals[i] FOR i IN range(1, len(vals)+1) IF (i-1)%3 = $c], 'sum')"
      s"""WITH d AS (
           SELECT doc_id, 3 + (doc_id % 6) AS w, 3 + ((doc_id // 6) % 6) AS h
           FROM documents),
         px AS (
           SELECT doc_id, w, h,
             list_transform(${splitmixList(seeds)}, z -> z % 256) AS vals
           FROM d)
         SELECT doc_id AS media_id, w::INT AS width, h::INT AS height,
           3 AS channels,
           round(CAST(list_aggregate(vals, 'sum') AS DOUBLE) / (w*h*3) / 255.0, 4) AS f_all,
           round(CAST(${chanSum(0)} AS DOUBLE) / (w*h) / 255.0, 4) AS f_r,
           round(CAST(${chanSum(1)} AS DOUBLE) / (w*h) / 255.0, 4) AS f_g,
           round(CAST(${chanSum(2)} AS DOUBLE) / (w*h) / 255.0, 4) AS f_b
         FROM px ORDER BY media_id"""
    },
    "mm3_frame_plan" ->
      """SELECT doc_id AS media_id,
           unnest(generate_series(0, octet_length(CAST(text AS BLOB)) * 10, 500)) AS frame_ts_ms
         FROM documents ORDER BY media_id, frame_ts_ms""",
    // the audio generation stream restated sample-by-sample (splitmix64 of
    // doc_id*999983+i → signed 16-bit), no codec involved; channel 0 is
    // flat index i with i % ch = 0 (frame-major interleave)
    "mm4_audio_decode" -> {
      val seeds = "list_transform(range(0, n*ch), i -> (doc_id*999983 + i)::HUGEINT)"
      def r6(x: String) = s"floor(($x)*1000000.0 + 0.5)/1000000.0"
      s"""WITH d AS (
           SELECT doc_id, 8000*(1 + doc_id % 3) AS rate,
             1 + (doc_id // 3) % 2 AS ch, 40 + doc_id % 30 AS n
           FROM documents),
         sm AS (
           SELECT doc_id, rate, ch, n,
             list_transform(${splitmixList(seeds)}, z -> z % 65536 - 32768) AS vals
           FROM d)
         SELECT doc_id AS media_id, rate::INT AS sample_rate, ch::INT AS channels,
           n::BIGINT AS n_frames,
           ${r6("CAST(list_aggregate(vals, 'sum') AS DOUBLE)/(n*ch)/32768.0")} AS mean_amp,
           ${r6("sqrt(CAST(list_aggregate(list_transform(vals, v -> v*v), 'sum') AS DOUBLE)/(n*ch))/32768.0")} AS rms,
           ${r6("CAST(list_aggregate([vals[i] FOR i IN range(1, len(vals)+1) IF (i-1)%ch = 0], 'sum') AS DOUBLE)/n/32768.0")} AS mean_c0
         FROM sm ORDER BY media_id"""
    }
  )
}
