package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.PrefixSum

/** Round-8 batch 107: multiple-testing control and the Heaps'-law fit —
  * the meta-statistics layer over the a-family tests and the t-family
  * growth curve.
  *
  *  - a54_bh_fdr: Benjamini–Hochberg FDR control over the family of
  *    per-type location tests (each event type's cent values vs the
  *    rest of the stream, the two-sample z from exact integer sums —
  *    the a39 spine). A fleet of drift monitors without multiplicity
  *    control alarms constantly; BH is the standard correction. The
  *    two-sided p comes from erfc(|z|/√2) evaluated with the
  *    Abramowitz–Stegun 7.1.26 polynomial — a FIXED dag of
  *    +,·,/,exp both engines evaluate identically, so p-values (and
  *    therefore the rank ordering and the discovery set) are
  *    bit-reproducible. Ranks come from posexplode of the SORTED
  *    (p, type) list — five rows, no window — and the BH cutoff
  *    k* = max{i : p₍ᵢ₎ ≤ α·i/m} is a max over an integer-gated
  *    predicate.
  *  - t33_heaps_law: the Heaps' exponent β (V ≈ K·nᵝ) fitted by exact
  *    OLS on the log-log checkpoints of t23's vocabulary growth curve.
  *    The curve itself is the one-PrefixSum-pass relation (checkpoint-
  *    bounded); the log sums fold in checkpoint order (pinned-fold
  *    discipline) and β, ln K close over them in one fixed dag. β≈0.5
  *    is classic natural text; β drifting toward 1 flags vocabulary
  *    that never saturates (noise, ids, code).
  *
  * Scale shape: a54 is one corpus scan → 5-row artifact → local list
  * algebra; t33 is t23's scan + PrefixSum → checkpoint-bounded fold.
  * No unkeyed windows, no driver loops.
  *
  * Reference context: no counterpart; closes the monitoring loop
  * (a-family tests → a54 decides which alarms survive) and the
  * tokenizer-planning loop (t23 curve → t33 exponent).
  */
object Extended107 {
  type Q = (SparkSession, String) => DataFrame

  /** Two-sided normal p-value from z: erfc(|z|/√2) via the
    * Abramowitz–Stegun 7.1.26 polynomial (|error| < 1.5e−7) — the SAME
    * +,·,/,exp sequence in both engines, so the dag is bit-identical.
    */
  private def pTwoSided(z: Column): Column = {
    val x = abs(z) / lit(math.sqrt(2.0))
    val tt = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = tt * (lit(0.254829592) +
      tt * (lit(-0.284496736) +
        tt * (lit(1.421413741) +
          tt * (lit(-1.453152027) + tt * lit(1.061405429)))))
    poly * exp(-(x * x))
  }

  /** The same polynomial as DuckDB SQL over an expression for |z|. */
  private def pTwoSidedSql(absZ: String): String = {
    val x = s"(($absZ) / sqrt(2.0))"
    val tt = s"(1.0 / (1.0 + 0.3275911 * $x))"
    s"(($tt * (0.254829592 + $tt * (-0.284496736 + $tt * (1.421413741 " +
      s"+ $tt * (-1.453152027 + $tt * 1.061405429))))) * exp(-($x * $x)))"
  }

  val queries: Map[String, Q] = Map(
    // ---- a54: BH-corrected per-type location alarms ----
    "a54_bh_fdr" -> ((s, d) => {
      def dec(c: Column) = c.cast("decimal(38,0)")
      val per = t(s, d, "events")
        .select(col("event_type"), round(col("value") * 100).cast("long").as("x"))
        .groupBy("event_type").agg(count(lit(1)).as("n"),
          sum(dec(col("x"))).as("sx"),
          sum(dec(col("x")) * dec(col("x"))).as("sxx"))
      val tot = per.agg(sum("n").as("nt"), sum("sx").as("sxt"),
        sum("sxx").as("sxxt"))
      // z: type mean vs rest-of-stream mean, unequal variances (a39 form)
      val z = per.crossJoin(broadcast(tot))
        .withColumn("n2", col("nt") - col("n"))
        .withColumn("sx2", col("sxt") - col("sx"))
        .withColumn("sxx2", col("sxxt") - col("sxx"))
        .withColumn("v1",
          (dec(col("n")) * col("sxx") - col("sx") * col("sx")).cast("double") /
            (col("n") * (col("n") - 1)).cast("double") / col("n").cast("double"))
        .withColumn("v2",
          (dec(col("n2")) * col("sxx2") - col("sx2") * col("sx2")).cast("double") /
            (col("n2") * (col("n2") - 1)).cast("double") / col("n2").cast("double"))
        .withColumn("z",
          (col("sx").cast("double") / col("n").cast("double") -
            col("sx2").cast("double") / col("n2").cast("double")) /
            sqrt(col("v1") + col("v2")))
        .withColumn("p", pTwoSided(col("z")))
        .select(col("event_type"), col("n"), col("z"), col("p"))
      // rank by sorted (p, type) via posexplode — m rows, no ranking window
      val ranked = z
        .agg(sort_array(collect_list(struct(col("p"), col("event_type"),
          col("n"), col("z")))).as("arr"))
        .select(size(col("arr")).cast("long").as("m"),
          posexplode(col("arr")).as(Seq("i", "s")))
        .select(col("s.event_type").as("event_type"), col("s.n").as("n"),
          round(col("s.z"), 6).as("z"), col("s.p").as("p_raw"),
          (col("i") + 1).cast("long").as("rank"), col("m"))
      val withCut = ranked
        .withColumn("bh_cutoff",
          lit(0.05) * col("rank").cast("double") / col("m").cast("double"))
        .withColumn("passes", col("p_raw") <= col("bh_cutoff"))
      // BH: reject all ranks up to the LARGEST passing rank — a 1-row
      // aggregate crossJoined back (no window, even a bounded one)
      val ks = withCut.agg(max(when(col("passes"), col("rank"))
        .otherwise(lit(0L))).as("kstar"))
      withCut.crossJoin(broadcast(ks))
        .select(col("event_type"), col("n"), col("z"),
          round(col("p_raw"), 9).as("p"),
          col("rank"),
          round(col("bh_cutoff"), 9).as("bh_cutoff"),
          (col("rank") <= col("kstar")).as("discovered"))
        .orderBy("rank")
    }),

    // ---- t33: Heaps'-law exponent from the t23 checkpoints ----
    "t33_heaps_law" -> ((s, d) => {
      val w = t(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
      val perDocTok = w.groupBy("doc_id").agg(count(lit(1)).as("nt"))
      val perDocNew = w.groupBy("word").agg(min("doc_id").as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("nw"))
      val joined = perDocTok.join(perDocNew, Seq("doc_id"), "left")
        .na.fill(0L, Seq("nw"))
      val curve = PrefixSum.cumSum(joined, "doc_id", Seq("nt", "nw"),
          bucketWidth = 64.0)
        .filter(col("doc_id") % 50 === 0)
        .select(col("doc_id"), col("cum_nt").as("nn"), col("cum_nw").as("vv"))
      // OLS on (ln n, ln V) folded in checkpoint order — bounded list
      curve.agg(sort_array(collect_list(struct(col("doc_id"),
          log(col("nn").cast("double")).as("lx"),
          log(col("vv").cast("double")).as("ly")))).as("arr"))
        .select(size(col("arr")).cast("long").as("k_checkpoints"),
          aggregate(col("arr"), struct(lit(0.0).as("sx"), lit(0.0).as("sy"),
            lit(0.0).as("sxx"), lit(0.0).as("sxy")),
            (acc, e) => struct(
              (acc("sx") + e("lx")).as("sx"), (acc("sy") + e("ly")).as("sy"),
              (acc("sxx") + e("lx") * e("lx")).as("sxx"),
              (acc("sxy") + e("lx") * e("ly")).as("sxy"))).as("f"))
        .select(col("k_checkpoints"),
          round((col("k_checkpoints") * col("f.sxy") - col("f.sx") * col("f.sy")) /
            (col("k_checkpoints") * col("f.sxx") - col("f.sx") * col("f.sx")), 6)
            .as("beta"),
          round(exp((col("f.sy") - col("f.sx") *
            ((col("k_checkpoints") * col("f.sxy") - col("f.sx") * col("f.sy")) /
              (col("k_checkpoints") * col("f.sxx") - col("f.sx") * col("f.sx")))) /
            col("k_checkpoints").cast("double")), 4).as("k_coef"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "a54_bh_fdr" -> {
      val p = pTwoSidedSql("abs(z)")
      s"""WITH per AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(round(value * 100) AS HUGEINT)) AS sx,
             sum(CAST(round(value * 100) AS HUGEINT)
               * CAST(round(value * 100) AS HUGEINT)) AS sxx
           FROM events GROUP BY event_type),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt, sum(sx) AS sxt,
             sum(sxx) AS sxxt FROM per),
         zt AS (
           SELECT event_type, n,
             (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
               - CAST(sxt - sx AS DOUBLE) / CAST(nt - n AS DOUBLE))
             / sqrt(
               CAST(n * sxx - sx * sx AS DOUBLE)
                 / CAST(n * (n - 1) AS DOUBLE) / CAST(n AS DOUBLE)
               + CAST((nt - n) * (sxxt - sxx) - (sxt - sx) * (sxt - sx)
                   AS DOUBLE)
                 / CAST((nt - n) * (nt - n - 1) AS DOUBLE)
                 / CAST(nt - n AS DOUBLE)) AS z
           FROM per CROSS JOIN tot),
         pt AS (SELECT event_type, n, z, $p AS p FROM zt),
         ranked AS (
           SELECT event_type, n, z, p,
             CAST(row_number() OVER (ORDER BY p, event_type) AS BIGINT)
               AS rank,
             CAST(count(*) OVER () AS BIGINT) AS m
           FROM pt),
         kstar AS (
           SELECT coalesce(max(rank), 0) AS k FROM ranked
           WHERE p <= 0.05 * CAST(rank AS DOUBLE) / CAST(m AS DOUBLE))
         SELECT event_type, n, round(z, 6) AS z, round(p, 9) AS p, rank,
           round(0.05 * CAST(rank AS DOUBLE) / CAST(m AS DOUBLE), 9)
             AS bh_cutoff,
           rank <= (SELECT k FROM kstar) AS discovered
         FROM ranked ORDER BY rank"""
    },
    "t33_heaps_law" ->
      """WITH w AS (
           SELECT doc_id, t.word
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                 FROM documents) t
           WHERE len(t.word) > 0),
         tok AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nt
                 FROM w GROUP BY doc_id),
         nw AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS nw FROM (
             SELECT word, min(doc_id) AS doc_id FROM w GROUP BY word)
           GROUP BY doc_id),
         joined AS (
           SELECT tok.doc_id, tok.nt, coalesce(nw.nw, 0) AS nw
           FROM tok LEFT JOIN nw ON tok.doc_id = nw.doc_id),
         curve AS (
           SELECT doc_id,
             CAST(sum(nt) OVER (ORDER BY doc_id) AS BIGINT) AS nn,
             CAST(sum(nw) OVER (ORDER BY doc_id) AS BIGINT) AS vv
           FROM joined),
         pts AS (
           SELECT doc_id, ln(CAST(nn AS DOUBLE)) AS lx,
             ln(CAST(vv AS DOUBLE)) AS ly
           FROM curve WHERE doc_id % 50 = 0),
         f AS (
           SELECT CAST(count(*) AS BIGINT) AS k,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(lx ORDER BY doc_id)), (a, b) -> a + b) AS sx,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(ly ORDER BY doc_id)), (a, b) -> a + b) AS sy,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(lx * lx ORDER BY doc_id)), (a, b) -> a + b) AS sxx,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(lx * ly ORDER BY doc_id)), (a, b) -> a + b) AS sxy
           FROM pts)
         SELECT k AS k_checkpoints,
           round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS beta,
           round(exp((sy - sx * ((k * sxy - sx * sy) / (k * sxx - sx * sx)))
             / CAST(k AS DOUBLE)), 4) AS k_coef
         FROM f"""
  )
}
