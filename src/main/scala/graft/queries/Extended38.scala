package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.Tables.t
import graft.streaming.EventStream

/** Round-6 surface extensions, batch 38: temperature-based source mixing
  * and the stream-static enrichment join under the oracle gate.
  *
  *  - tp12: α-temperature mixing (T5/Pile discipline) — per-source doc
  *    budgets ∝ n_s^α (α=0.5 flattens the source distribution), then a
  *    deterministic md5-ranked prefix per source. sqrt is IEEE
  *    exact-rounded (identical on both engines); the Σw normalizer folds
  *    the per-source weights in SOURCE-sorted order (the canonical-fold
  *    discipline), and the final budget is floor(K·w_s/Σw) — so the doc
  *    selection is engine-exact with no float-order hazard.
  *  - st10: the stream-static broadcast enrichment (every micro-batch
  *    joins the static customer dim) replayed to completion — the
  *    streaming twin of `e7_enrich_join`, previously spec-only, now
  *    facing e7's own oracle SQL.
  */
object Extended38 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- tp12: alpha-temperature source mixing ----
    "tp12_alpha_mixing" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          md5(col("doc_id").cast("string").cast("binary")).as("h"))
      val perSrc = docs.groupBy("source").agg(count(lit(1)).as("ns"))
        .withColumn("w", sqrt(col("ns").cast("double")))
      // Σw folded in source order — one canonical IEEE sum, broadcast back
      val sw = perSrc.agg(aggregate(
        sort_array(collect_list(struct(col("source"), col("w")))), lit(0.0),
        (acc, x) => acc + x.getField("w")).as("sw"))
      val quota = perSrc.join(broadcast(sw))
        .select(col("source"),
          floor(lit(200.0) * col("w") / col("sw")).cast("long").as("k"))
      val ranked = docs.withColumn("rk",
        row_number().over(Window.partitionBy("source").orderBy("h", "doc_id")))
      ranked.join(broadcast(quota), "source")
        .filter(col("rk") <= col("k"))
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
    }),

    // ---- st10: stream-static enrichment join, replayed ----
    // No per-file wave cap: the enrich join is STATELESS (broadcast dim,
    // no cross-batch state to certify), so the replay's wave count is not
    // load-bearing — one AvailableNow batch keeps the sweep honest and
    // cheap. The stateful replays (st3–st9) keep their pinned waves.
    "st10_stream_enrich" -> ((s, d) => {
      val dir = Extended26.stagedTimeWaves(s, d)
      val schema = graft.streaming.EventStream.cachedSchema(s, dir)
      val stream = EventStream.normalize(s.readStream.schema(schema)
        .parquet(dir))
      val dim = t(s, d, "customer").select("c_custkey", "c_mktsegment")
      val joined = stream.join(broadcast(dim),
          stream("user_id") === dim("c_custkey"))
        .select(col("c_mktsegment"), col("value"))
      val mem = Extended18.runToCompletion(s, joined, "st10_mem",
        OutputMode.Append())
      mem.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
        .orderBy("c_mktsegment")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "tp12_alpha_mixing" ->
      """WITH docs AS (
           SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h
           FROM documents),
         per_src AS (
           SELECT source, count(*) AS ns, sqrt(count(*)) AS w
           FROM docs GROUP BY source),
         sw AS (
           SELECT list_reduce(
             list_prepend(CAST(0 AS DOUBLE),
               list_transform(
                 list_sort(list(struct_pack(source := source, w := w))),
                 x -> x.w)),
             (acc, v) -> acc + v) AS sw
           FROM per_src),
         quota AS (
           SELECT source, CAST(floor(200.0 * w / sw) AS BIGINT) AS k
           FROM per_src, sw),
         ranked AS (
           SELECT source, doc_id,
             row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
           FROM docs)
         SELECT source, doc_id FROM ranked JOIN quota USING (source)
         WHERE rk <= k ORDER BY source, doc_id""",
    // identical to e7: the streaming replay must reproduce the batch join
    "st10_stream_enrich" ->
      """SELECT c_mktsegment, count(*) AS n, round(sum(value), 2) AS total_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment"""
  )
}
