package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.PrefixSum
import graft.route.Hits

/** Round-7 batch 63: corpus-growth analytics and link-analysis ranking.
  *
  *  - t23_vocab_growth: the Heaps'-law vocabulary growth curve — for
  *    checkpoints along the corpus (every 50th doc_id), the cumulative
  *    token count and cumulative DISTINCT vocabulary size. The classic
  *    tokenizer-planning question ("how fast does the vocab still
  *    grow?") needs first occurrences, not distinct-counts per prefix:
  *    each word is charged to min(doc_id), per-doc new-word counts are
  *    one hash aggregate, and BOTH running totals come from one
  *    [[graft.operators.PrefixSum]] pass — no single-partition window,
  *    no per-prefix re-scan (a naive per-checkpoint COUNT(DISTINCT)
  *    over the prefix re-reads the corpus once per checkpoint).
  *  - r12_hits: Kleinberg hubs/authorities on the REAL order→part
  *    bipartite graph (distinct lineitem pairs), via
  *    [[graft.route.Hits]] — unnormalized integer power iteration, so
  *    the distributed fixpoint is BIGINT-exact and the oracle can
  *    restate the two rounds as plain unrolled join+sum SQL. Top-20
  *    authority parts ("most co-ordered-with-strong-orders") with both
  *    scores.
  *
  * Reference context: README.md:66-74 ships a centrality family; r12
  * extends it beside r4 (PageRank). t23 extends the t-family corpus
  * statistics (t8 bigrams, t19 Zipf slope).
  */
object Extended63 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- t23: Heaps'-law vocabulary growth at doc checkpoints ----
    "t23_vocab_growth" -> ((s, d) => {
      val w = t(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      val perDocTok = w.groupBy("doc_id").agg(count(lit(1)).as("nt"))
      val perDocNew = w.groupBy("word").agg(min("doc_id").as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("nw"))
      val joined = perDocTok.join(perDocNew, Seq("doc_id"), "left")
        .na.fill(0L, Seq("nw"))
      PrefixSum.cumSum(joined, "doc_id", Seq("nt", "nw"), bucketWidth = 64.0)
        .filter(col("doc_id") % 50 === 0)
        .select(col("doc_id"), col("cum_nt").as("cum_tokens"),
          col("cum_nw").as("vocab"))
        .orderBy("doc_id")
    }),

    // ---- r12: HITS authorities on the order→part bipartite graph ----
    "r12_hits" -> ((s, d) => {
      // order and part key spaces overlap numerically — disambiguate by
      // parity (orders even, parts odd): 8-byte ids through the 5 keyed
      // aggregates instead of strings (measured 1.6× on the sweep)
      val e = t(s, d, "lineitem")
        .select((col("l_orderkey") * 2L).as("src"),
          (col("l_partkey") * 2L + 1L).as("dst"))
        .distinct()
      Hits.authorities(s, e, iters = 2)
        .filter(col("node") % 2L === 1L)
        .select(((col("node") - 1L) / 2L).cast("long").as("l_partkey"),
          col("auth"))
        .orderBy(col("auth").desc, col("l_partkey"))
        .limit(20)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "t23_vocab_growth" ->
      """WITH w AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
         nt AS (SELECT doc_id, count(*) AS nt FROM w GROUP BY doc_id),
         fd AS (SELECT word, min(doc_id) AS fdoc FROM w GROUP BY word),
         nw AS (SELECT fdoc AS doc_id, count(*) AS nw FROM fd GROUP BY fdoc),
         j AS (
           SELECT t.doc_id, t.nt, coalesce(n.nw, 0) AS nw
           FROM nt t LEFT JOIN nw n ON t.doc_id = n.doc_id),
         c AS (
           SELECT doc_id,
             sum(nt) OVER (ORDER BY doc_id) AS cum_tokens,
             sum(nw) OVER (ORDER BY doc_id) AS vocab
           FROM j)
         SELECT doc_id, CAST(cum_tokens AS BIGINT) AS cum_tokens,
           CAST(vocab AS BIGINT) AS vocab
         FROM c WHERE doc_id % 50 = 0 ORDER BY doc_id""",
    "r12_hits" ->
      """WITH e AS (
           SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         a1 AS (SELECT p, CAST(count(*) AS BIGINT) AS a FROM e GROUP BY p),
         h1 AS (
           SELECT e.o, CAST(sum(a1.a) AS BIGINT) AS h
           FROM e JOIN a1 ON e.p = a1.p GROUP BY e.o),
         a2 AS (
           SELECT e.p, CAST(sum(h1.h) AS BIGINT) AS a
           FROM e JOIN h1 ON e.o = h1.o GROUP BY e.p)
         SELECT p AS l_partkey, a AS auth FROM a2
         ORDER BY a DESC, p LIMIT 20"""
  )
}
