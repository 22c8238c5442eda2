package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-6 surface extensions, batch 34: bag-semantics set operations,
  * asymmetric containment dedup, deterministic random-walk sampling, and
  * the IGNORE NULLS window family.
  *
  *  - u6: `intersectAll`/`exceptAll` — multiset semantics (duplicates
  *    preserved up to matched multiplicity), the operator pair DISTINCT
  *    set ops can't express. Spark plans these as count-compare
  *    aggregations, not joins.
  *  - dedup_containment: |A∩B|/|A| over word-shingle sets — the
  *    asymmetric near-dup measure that catches quotation/subset
  *    inclusion where Jaccard dilutes. Inverted-index pair generation
  *    (shuffle carries (shingle, doc) pairs), never all-pairs.
  *  - r9: hash-seeded deterministic random walks over the co-order part
  *    graph — node2vec-style sampling with md5 replacing the RNG, so
  *    walks are reproducible across runs AND engines (the t7/tp5 hash
  *    precedent applied to graph sampling). Each step is one
  *    frontier×edges join + min(struct) argmin — O(L) shuffles total.
  *  - w10: first/last/lag with IGNORE NULLS over a constructed sparse
  *    column — gap-tolerant carry-forward semantics.
  */
object Extended34 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- u6: multiset INTERSECT ALL / EXCEPT ALL ----
    "u6_bag_setops" -> ((s, d) => {
      val cn = t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
      val sn = t(s, d, "supplier").select(col("s_nationkey").as("nationkey"))
      val ia = cn.intersectAll(sn).groupBy("nationkey")
        .agg(count(lit(1)).as("n_intersect_all"))
      val ea = cn.exceptAll(sn).groupBy("nationkey")
        .agg(count(lit(1)).as("n_except_all"))
      ia.join(ea, Seq("nationkey"), "full_outer")
        .select(col("nationkey"),
          coalesce(col("n_intersect_all"), lit(0L)).as("n_intersect_all"),
          coalesce(col("n_except_all"), lit(0L)).as("n_except_all"))
        .orderBy("nationkey")
    }),

    // ---- asymmetric containment dedup ----
    "dedup_containment" -> ((s, d) => {
      // the shingle relation feeds FOUR consumers (sizes, df filter, both
      // pair sides) — materialize the explode+distinct once instead of
      // re-splitting every document per consumer (the cache is released
      // by the terminal limit(20) being eager via the ordered take; at
      // corpus scale this is a persisted shingle table). localCheckpoint
      // (not cache) so no executor-memory entry outlives the invocation.
      // shingles leave the scan stage as xxhash64 LONGS: the distinct, the
      // df cap, and the pair join all carry 8 bytes instead of a ~25-byte
      // three-word string — containment is computed from counts only, so a
      // hash stands in for the shingle with P(any collision) ~ pairs·2⁻⁶⁴
      // (the Bridges tag discipline; the DuckDB oracle keeps the strings)
      // fanOut: the shingle explode is the query's CPU center and the
      // single-file scan gives it one split — spread the (doc_id, text)
      // rows across the session's cores before splitting
      val sh = graft.operators.Par.fanOut(
          t(s, d, "documents").select(col("doc_id"), col("text")))
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(1, size(ws) - 2),
             i -> concat_ws(' ', ws[i - 1], ws[i], ws[i + 1]))""")).as("shs"))
        .select(col("doc_id"), xxhash64(col("shs")).as("sh"))
        .distinct()
        .localCheckpoint()
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("na"))
      // df cap: a shingle present in > 64 docs ("the of the"-class) would
      // contribute O(df²) pairs for near-zero signal — the standard
      // inverted-index guard. |A| (na) stays UNcapped, so containment
      // remains a true fraction of the full shingle set; only the pair
      // generator skips ubiquitous shingles (no-op at test scale, where
      // max df = 7; load-bearing at corpus scale).
      val rare = sh.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 64).select("sh")
      // pin the pair stage's parallelism: the self-join below is the
      // query's hottest stage (profiled: ONE 24 MB-write task under AQE's
      // bytes-based coalescing), and a checkpoint hash-partitioned by sh
      // with an EXPLICIT partition count (REPARTITION_BY_NUM — AQE keeps
      // it) lets both self-join sides reuse this one exchange. The count
      // is DATA-derived (rows / 128k, capped at 4×cores), not the core
      // count — the r12 `defaultParallelism` pin made 32 kilobyte-sized
      // tasks at sf0.1 (8c/32c anti-scaling, ratio 0.41) and would cap a
      // corpus-scale shuffle at machine width; sh is checkpointed, so the
      // sizing count is one cheap metadata-ish job, not a rescan
      val shr = sh.join(rare, "sh")
        .repartition(graft.operators.Par.sizedPartitions(sh, sh.count(),
          targetRowsPerTask = 131072L), col("sh"))
        .localCheckpoint()
      val inter = shr.as("x").join(shr.as("y"), Seq("sh"))
        .filter(col("x.doc_id") =!= col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("inter"))
      inter.join(sizes.withColumnRenamed("doc_id", "a"), "a")
        .select(col("a"), col("b"),
          round(col("inter").cast("double") / col("na"), 4).as("containment"))
        .orderBy(col("containment").desc, col("a"), col("b"))
        .limit(20)
    }),

    // ---- r9: deterministic hash-seeded random walks ----
    "r9_hash_walk" -> ((s, d) => {
      // co-order part graph, both directions (j9's relation, undirected)
      val li = t(s, d, "lineitem").filter(col("l_linenumber") <= 3)
        .select("l_orderkey", "l_partkey")
      // same co-order pair generator as j9/j31 (one per-order aggregate,
      // no broadcast self-join — see CoOrderPairs); the walk needs BOTH
      // directions, so the canonical a<b pairs are deduped once and
      // mirrored — identical to the old x≠y join's distinct.
      // localCheckpoint: fwd feeds the start selection plus one join per
      // walk step (4 consumers), which otherwise re-derived the pair
      // relation every step
      val und = graft.operators.CoOrderPairs.undirected(li)
        .localCheckpoint()
      val fwd = und.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(und.select(col("b").as("src"), col("a").as("dst")))
      // 20 deterministic start nodes: lowest part keys that have edges
      val starts = fwd.select(col("src")).distinct()
        .orderBy("src").limit(20)
        .select(col("src").as("start"), col("src").as("cur"))
      var frontier = starts.select(col("start"), col("cur"), lit(0).as("step"))
      var walk = frontier
      for (stepNo <- 1 to 3) {
        // next = argmin md5(start:step:neighbor) over cur's neighbors —
        // the hash replaces the RNG; min(struct) is one partial agg
        val nxt = frontier.join(fwd, col("cur") === col("src"))
          .select(col("start"),
            struct(md5(concat_ws(":", col("start"), lit(stepNo), col("dst")))
              .as("h"), col("dst")).as("cand"))
          .groupBy("start").agg(min("cand").as("m"))
          .select(col("start"), col("m.dst").as("cur"),
            lit(stepNo).as("step"))
        frontier = nxt
        walk = walk.unionByName(nxt)
      }
      walk.select(col("start"), col("step"), col("cur").as("node"))
        .orderBy("start", "step")
    }),

    // ---- w10: IGNORE NULLS window family ----
    "w10_ignore_nulls" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          // sparse column: value visible only on purchases
          when(col("event_type") === "purchase", round(col("value"), 2))
            .as("pv"))
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.select(col("user_id"), col("event_id"), col("pv"),
          last(col("pv"), ignoreNulls = true).over(wAll).as("carry_fwd"),
          lag(col("pv"), 1, null, ignoreNulls = true).over(w)
            .as("prev_purchase"))
        .orderBy("user_id", "event_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "u6_bag_setops" ->
      """WITH ia AS (
           SELECT nationkey, count(*) AS n_intersect_all FROM (
             SELECT c_nationkey AS nationkey FROM customer
             INTERSECT ALL
             SELECT s_nationkey FROM supplier)
           GROUP BY nationkey),
         ea AS (
           SELECT nationkey, count(*) AS n_except_all FROM (
             SELECT c_nationkey AS nationkey FROM customer
             EXCEPT ALL
             SELECT s_nationkey FROM supplier)
           GROUP BY nationkey)
         SELECT nationkey,
           coalesce(n_intersect_all, 0) AS n_intersect_all,
           coalesce(n_except_all, 0) AS n_except_all
         FROM ia FULL OUTER JOIN ea USING (nationkey)
         ORDER BY nationkey""",
    "dedup_containment" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id,
             unnest([array_to_string(ws[i:i+2], ' ')
                     FOR i IN range(1, len(ws) - 1)]) AS sh
           FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
           WHERE len(ws) >= 3),
         sizes AS (SELECT doc_id, count(*) AS na FROM sh GROUP BY doc_id),
         rare AS (SELECT sh FROM (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
                  WHERE df <= 64),
         shr AS (SELECT doc_id, sh FROM sh JOIN rare USING (sh)),
         inter AS (
           SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
           FROM shr x JOIN shr y USING (sh)
           WHERE x.doc_id <> y.doc_id
           GROUP BY x.doc_id, y.doc_id)
         SELECT a, b, round(CAST(inter AS DOUBLE) / na, 4) AS containment
         FROM inter JOIN sizes ON a = doc_id
         ORDER BY containment DESC, a, b LIMIT 20""",
    "r9_hash_walk" ->
      """WITH li AS (
           SELECT l_orderkey, l_partkey FROM lineitem WHERE l_linenumber <= 3),
         fwd AS (
           SELECT DISTINCT x.l_partkey AS src, y.l_partkey AS dst
           FROM li x JOIN li y USING (l_orderkey)
           WHERE x.l_partkey <> y.l_partkey),
         starts AS (
           SELECT src AS start, src AS cur FROM (
             SELECT DISTINCT src FROM fwd ORDER BY src LIMIT 20)),
         s1 AS (
           SELECT start, arg_min(dst,
             md5(start || ':' || 1 || ':' || dst)) AS cur
           FROM starts JOIN fwd ON cur = src GROUP BY start),
         s2 AS (
           SELECT start, arg_min(dst,
             md5(start || ':' || 2 || ':' || dst)) AS cur
           FROM s1 JOIN fwd ON cur = src GROUP BY start),
         s3 AS (
           SELECT start, arg_min(dst,
             md5(start || ':' || 3 || ':' || dst)) AS cur
           FROM s2 JOIN fwd ON cur = src GROUP BY start)
         SELECT start, step, node FROM (
           SELECT start, 0 AS step, cur AS node FROM starts
           UNION ALL SELECT start, 1, cur FROM s1
           UNION ALL SELECT start, 2, cur FROM s2
           UNION ALL SELECT start, 3, cur FROM s3)
         ORDER BY start, step""",
    "w10_ignore_nulls" ->
      """SELECT user_id, event_id,
           CASE WHEN event_type = 'purchase' THEN round(value, 2) END AS pv,
           last_value(CASE WHEN event_type = 'purchase' THEN round(value, 2) END
             IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carry_fwd,
           lag(CASE WHEN event_type = 'purchase' THEN round(value, 2) END
             IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS prev_purchase
         FROM events
         ORDER BY user_id, event_id"""
  )
}
