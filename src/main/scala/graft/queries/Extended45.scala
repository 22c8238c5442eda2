package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.llm.Similarity

/** Round-6 surface extensions, batch 45: DAG critical path, exact MAD,
  * and contrastive hard-negative mining.
  *
  *  - j20: LONGEST PATH per node on a DAG ([[graft.route.DagPath]] —
  *    the supernode contraction with u < v is acyclic BY CONSTRUCTION,
  *    so longest-path is well-defined; one ascending sweep under the
  *    gate, frontier Bellman relaxation above it, depth rounds: 6 at
  *    sf0.01, 35 at sf0.1 on the sparse 1-in-89 sample). The oracle
  *    enumerates all (node, depth) pairs by recursive closure and takes
  *    the max — different algorithm, same fixpoint; unit weights keep
  *    every distance an exact integer.
  *  - a22: exact MEDIAN ABSOLUTE DEVIATION per group — the robust-stats
  *    companion to a19/a20: median by cumulative selection over cent-
  *    scaled (group, value) counts, then the SAME selection over
  *    (group, |value − median|) counts. The deviation histogram is a
  *    pure function of the VALUE histogram, so the whole query is ONE
  *    distributed hash aggregate; both selections walk the collected
  *    domain-bounded histogram on the driver
  *    ([[graft.operators.Selection.medianMadBounded]]), state ∝ distinct
  *    values per group, never buffering rows; only BIGINT comparisons
  *    (2·cw ≥ tw) — no float-order hazard anywhere.
  *  - tp17: HARD-NEGATIVE MINING (contrastive training's data step —
  *    RocketQA/ANCE style): for each probe vector, the top-5 most
  *    cosine-similar corpus vectors with a DIFFERENT class label —
  *    similar-but-wrong examples. Probes broadcast (tiny side), the
  *    kernel is the native codegen dot/cosine expression, and per-probe
  *    top-5 goes through the bounded-heap GroupTopK physical operator
  *    (O(k) state per probe), exactly like j11 — never a global sort,
  *    never a per-group window sort.
  */
object Extended45 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- j20: longest in-path per node on the sparse supernode DAG ----
    "j20_dag_longest_path" -> ((s, d) =>
      graft.route.DagPath.longestPath(s, Extended42.sparseSupernodeEdges(s, d))
        .select(col("node"), col("dist").as("longest_in_path"))
        .orderBy("node")),

    // ---- a22: exact MAD per group by double cumulative selection ----
    "a22_mad" -> ((s, d) => {
      val x = t(s, d, "lineitem").select(col("l_returnflag").as("flag"),
        round(col("l_extendedprice") * 100).cast("long").as("pc"))
      // ONE job, NO shuffle: the exact value histogram is built as a
      // mergeable sketch (per-partition LongMap → packed sorted runs →
      // treeAggregate), and the deviation histogram is a pure function of
      // it (re-key by |pc − med|, re-sum), so BOTH cumulative selections
      // run on the driver over the domain-bounded merged artifact
      // (operators/Selection.medianMadBounded, loud maxCollect guard) —
      // no pre-aggregation needed, raw rows fold straight into the sketch
      graft.operators.Selection
        .medianMadBounded(x.withColumn("n", lit(1L)),
          Seq("flag"), "pc", "n", "medc", "madc")
        .select(col("flag"),
          round(col("medc").cast("double") / 100.0, 2).as("median_price"),
          round(col("madc").cast("double") / 100.0, 2).as("mad_price"))
        .orderBy("flag")
    }),

    // ---- tp17: hard-negative mining for contrastive training ----
    "tp17_hard_negatives" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val probes = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("pid"), col("embedding").as("pv"),
          col("label").as("plabel"))
      val scored = e.crossJoin(broadcast(probes))
        .filter(col("label") =!= col("plabel") && col("vec_id") =!= col("pid"))
        .select(col("pid"), col("vec_id"),
          Similarity.cosine(col("embedding"), col("pv")).as("s"))
      graft.plans.GroupTopK.topK(scored, Seq("pid"),
          Seq(("s", false), ("vec_id", true)), 5)
        .select(col("pid"), col("vec_id"), round(col("s"), 4).as("sim"))
        .orderBy(col("pid"), col("s").desc, col("vec_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "j20_dag_longest_path" ->
      """WITH RECURSIVE edges AS (
           SELECT DISTINCT least(o_custkey % 128, o_orderkey % 128) AS u,
                  greatest(o_custkey % 128, o_orderkey % 128) AS v
           FROM orders
           WHERE o_orderkey % 89 = 0 AND o_custkey % 128 <> o_orderkey % 128),
         nodes AS (SELECT DISTINCT node FROM
           (SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)),
         rr AS (
           SELECT node, CAST(0 AS BIGINT) AS dist FROM nodes
           UNION
           SELECT e.v AS node, rr.dist + 1 AS dist
           FROM rr JOIN edges e ON e.u = rr.node)
         SELECT node, max(dist) AS longest_in_path FROM rr
         GROUP BY node ORDER BY node""",
    "a22_mad" ->
      """WITH x AS (SELECT l_returnflag AS flag,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
           FROM lineitem),
         cnt AS (SELECT flag, pc, count(*) AS n FROM x GROUP BY 1, 2),
         med AS (
           SELECT flag, min(pc) AS medc FROM (
             SELECT flag, pc,
               sum(n) OVER (PARTITION BY flag ORDER BY pc) AS cw,
               sum(n) OVER (PARTITION BY flag) AS tw
             FROM cnt) WHERE 2 * cw >= tw GROUP BY flag),
         dev AS (
           SELECT x.flag, abs(x.pc - m.medc) AS dv
           FROM x JOIN med m ON x.flag = m.flag),
         dcnt AS (SELECT flag, dv, count(*) AS n FROM dev GROUP BY 1, 2),
         mad AS (
           SELECT flag, min(dv) AS madc FROM (
             SELECT flag, dv,
               sum(n) OVER (PARTITION BY flag ORDER BY dv) AS cw,
               sum(n) OVER (PARTITION BY flag) AS tw
             FROM dcnt) WHERE 2 * cw >= tw GROUP BY flag)
         SELECT m.flag, round(CAST(med.medc AS DOUBLE) / 100.0, 2) AS median_price,
           round(CAST(m.madc AS DOUBLE) / 100.0, 2) AS mad_price
         FROM mad m JOIN med ON m.flag = med.flag ORDER BY m.flag""",
    "tp17_hard_negatives" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
             FROM embeddings),
         probes AS (SELECT vec_id AS pid, v AS pv, label AS plabel
             FROM e WHERE vec_id < 5),
         scored AS (
           SELECT p.pid, c.vec_id, list_cosine_similarity(c.v, p.pv) AS s
           FROM e c, probes p
           WHERE c.label <> p.plabel AND c.vec_id <> p.pid)
         SELECT pid, vec_id, round(s, 4) AS sim FROM (
           SELECT pid, vec_id, s,
             row_number() OVER (PARTITION BY pid ORDER BY s DESC, vec_id) AS rn
           FROM scored) WHERE rn <= 5 ORDER BY pid, s DESC, vec_id"""
  )
}
