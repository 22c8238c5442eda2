package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.route.Bridges

/** Round-6 surface extensions, batch 42: cut-edge detection and
  * interval-union duplicated-span coverage.
  *
  *  - j17: BRIDGE EDGES ([[graft.route.Bridges]] — local Tarjan low-link
  *    under the gate, spanning-forest + XOR-cover Borůvka above it;
  *    GraphOpsPropertySpec pins the two paths equal). The graph is a sparse
  *    supernode contraction of orders (1-in-89 sample of orderkeys,
  *    128 supernodes) — sparse enough to have real cut edges (26 at
  *    sf0.01). The oracle is a completely different algorithm:
  *    per-excluded-edge BFS reachability as one recursive CTE (a
  *    |E|-way simultaneous fixpoint) — it must land on the identical
  *    edge set because bridges are a graph invariant.
  *  - tp15: duplicated-span COVERAGE per document — tp13's duplicated
  *    word-5-gram positions turned into maximal merged intervals
  *    (classic gaps-and-islands: an island breaks where a span starts
  *    past the running max end) and measured as union length / word
  *    count. This is the quantity substring-dedup policies threshold on
  *    (Lee et al. 2022 remove spans, not documents): tp13's dup_frac
  *    counts duplicated POSITIONS, which double-counts overlapping
  *    grams; the interval union is the true contaminated-text fraction.
  *    All arithmetic is exact integers until the final single division.
  *    Scale shape: the gram→dup relation is the same one shuffle as
  *    tp13; the merge is one per-document window over dup positions
  *    only (≈10% of positions here), partitioned by doc_id — never a
  *    global sort.
  */
object Extended42 {
  type Q = (SparkSession, String) => DataFrame

  /** Sparse supernode graph shared by query and spec: 1-in-89 orderkey
    * sample contracted to 128 supernodes — at sf0.01, 166 edges / 26
    * bridges.
    */
  private[graft] def sparseSupernodeEdges(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .filter(col("o_orderkey") % 89 === 0)
      .select(least(col("o_custkey") % 128, col("o_orderkey") % 128).as("u"),
        greatest(col("o_custkey") % 128, col("o_orderkey") % 128).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  val queries: Map[String, Q] = Map(
    // ---- j17: bridge (cut) edges ----
    "j17_bridges" -> ((s, d) =>
      Bridges.bridges(s, sparseSupernodeEdges(s, d)).orderBy("u", "v")),

    // ---- tp15: duplicated-span interval coverage per document ----
    "tp15_dup_span_coverage" -> ((s, d) => {
      val n = 5
      val w = t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("words"))
      val eligible = w.filter(size(col("words")) >= n)
      val g = eligible.select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, size(words) - $n), " +
            s"i -> concat_ws(' ', slice(words, i + 1, $n)))"))
          .as(Seq("pos", "gram")))
      val dup = g.groupBy("gram")
        .agg(count_distinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2)
        .select("gram")
      val sp = g.join(dup, Seq("gram"), "left_semi")
        .select(col("doc_id"), col("pos").as("s"),
          (col("pos") + n).as("e"))
      val byDoc = Window.partitionBy("doc_id").orderBy("s")
      val brk = sp.withColumn("brk",
        when(col("s") > coalesce(
          max("e").over(byDoc.rowsBetween(Window.unboundedPreceding, -1)),
          lit(-1)), 1).otherwise(0))
      val grp = brk.withColumn("island",
        sum("brk").over(Window.partitionBy("doc_id").orderBy("s", "e")))
      val cov = grp.groupBy("doc_id", "island")
        .agg(min("s").as("mn"), max("e").as("mx"))
        .groupBy("doc_id").agg(sum(col("mx") - col("mn")).as("covered"))
      w.select(col("doc_id"), size(col("words")).cast("long").as("n_words"))
        .join(cov, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_words"),
          coalesce(col("covered"), lit(0L)).as("covered_words"),
          round(coalesce(col("covered"), lit(0L)) / col("n_words"), 4)
            .as("coverage"))
        .orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "j17_bridges" ->
      """WITH RECURSIVE edges AS (
           SELECT least(o_custkey % 128, o_orderkey % 128) AS u,
                  greatest(o_custkey % 128, o_orderkey % 128) AS v
           FROM orders
           WHERE o_orderkey % 89 = 0 AND o_custkey % 128 <> o_orderkey % 128
           GROUP BY 1, 2),
         eid AS (SELECT row_number() OVER (ORDER BY u, v) AS id, u, v FROM edges),
         bidir AS (SELECT id, u AS a, v AS b FROM eid
                   UNION ALL SELECT id, v, u FROM eid),
         reach AS (
           SELECT id AS ex, u AS node FROM eid
           UNION
           SELECT r.ex, b.b AS node
           FROM reach r JOIN bidir b ON b.a = r.node AND b.id <> r.ex)
         SELECT e.u, e.v FROM eid e
         WHERE NOT EXISTS (SELECT 1 FROM reach r WHERE r.ex = e.id AND r.node = e.v)
         ORDER BY u, v""",
    "tp15_dup_span_coverage" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         g AS (
           SELECT doc_id, i AS pos, array_to_string(words[i+1:i+5], ' ') AS gram
           FROM w, LATERAL (SELECT unnest(range(0, len(words) - 4)) AS i) r
           WHERE len(words) >= 5),
         dg AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
         sp AS (SELECT doc_id, pos AS s, pos + 5 AS e FROM g
                WHERE gram IN (SELECT gram FROM dg)),
         isl AS (
           SELECT doc_id, s, e,
             CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
             THEN 1 ELSE 0 END AS brk
           FROM sp),
         grp AS (
           SELECT doc_id, s, e,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e) AS island
           FROM isl),
         cov AS (
           SELECT doc_id, sum(mx - mn) AS covered
           FROM (SELECT doc_id, island, min(s) AS mn, max(e) AS mx
                 FROM grp GROUP BY 1, 2)
           GROUP BY doc_id)
         SELECT w.doc_id, len(w.words) AS n_words,
           CAST(coalesce(c.covered, 0) AS BIGINT) AS covered_words,
           round(coalesce(c.covered, 0) * 1.0 / len(w.words), 4) AS coverage
         FROM w LEFT JOIN cov c ON w.doc_id = c.doc_id
         ORDER BY w.doc_id"""
  )
}
