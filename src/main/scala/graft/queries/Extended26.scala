package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.Tables.t
import graft.llm.Similarity
import graft.route.Components
import graft.streaming.EventStream

/** Round-6 surface extensions, batch 26: SemDeDup-style semantic
  * deduplication (the embedding-cluster prune from the public SemDeDup
  * paper, restated down to the k-means training by the oracle), a second
  * big-big TPC-H star shape (Q7 bi-nation volume with order-exact scaled
  * money math), deterministic label-propagation community detection (a
  * fixed-round relational fixpoint the oracle unrolls), and the streaming
  * twin of the overlapping sliding-window aggregate.
  */
object Extended26 {
  type Q = (SparkSession, String) => DataFrame

  /** Stage the event log as two TIME-ORDERED wave files (first/second
    * half by (ts, event_id) rank) with pinned increasing mtimes, once per
    * (process, sf dir). Time-ordered arrival is how production streams
    * arrive, and it guarantees the watermark never classifies wave-2 rows
    * as late — so the replay's equality with the batch aggregate tests
    * cross-batch sliding-window state, not watermark clemency.
    */
  private[queries] def stagedTimeWaves(s: SparkSession, d: String): String = {
    val dir = Paths.get(Scratch.dir("st6_events", d))
    val ready = dir.resolve("_READY")
    Scratch.sync(dir.toString) { if (!Files.exists(ready)) {
      Files.createDirectories(dir)
      // raw read (no ts normalization): waves must carry the exact
      // parquet timestamp flavor of the source log for the stream schema
      val ev = s.read.parquet(s"$d/events.parquet")
      // fixture staging, once per (process, sf dir): the global row_number
      // is how the two time-ordered waves are CUT, not part of any
      // production plan — the log is build-sized and the write is already
      // coalesce(1) per wave
      val ranked = ev.withColumn("_rn",
        row_number().over(Window.orderBy(col("ts"), col("event_id"))))
      val n = ranked.count()
      Seq(("a_wave0.parquet", col("_rn") <= n / 2),
          ("b_wave1.parquet", col("_rn") > n / 2)).foreach {
        case (name, pred) =>
          val tmp = Files.createTempDirectory("graft_st6")
          ranked.filter(pred).drop("_rn").coalesce(1)
            .write.mode("overwrite").parquet(tmp.toString)
          val part = Files.list(tmp)
            .filter(_.getFileName.toString.startsWith("part-")).findFirst.get
          Files.copy(part, dir.resolve(name))
      }
      Seq("a_wave0.parquet", "b_wave1.parquet").zipWithIndex.foreach {
        case (nm, i) =>
          Files.setLastModifiedTime(dir.resolve(nm),
            java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
      }
      Files.createFile(ready)
    } }
    dir.toString
  }

  val queries: Map[String, Q] = Map(
    // ---- tp8: SemDeDup (semantic dedup by embedding clusters) ----
    // k-means clusters (the trained-IVF machinery), then near-duplicate
    // pruning ONLY within clusters — Σ|cluster|² pair work instead of
    // O(n²), co-partitioned on the cluster id. Keep rule: b drops iff
    // some a < b in its cluster has cosine > 0.45. The oracle replays
    // the ENTIRE path — seed, two Lloyd iterations with fixed-point
    // means, nearest-centroid assignment, within-cluster pair prune —
    // so the green row certifies the training, not just the join.
    "tp8_semdedup" -> ((s, d) =>
      Similarity.semDedup(t(s, d, "embeddings"), "vec_id", "embedding",
        threshold = 0.45, nCentroids = 16, trainIters = 2)
        .orderBy("vec_id")),

    // ---- q11: TPC-H Q7 analog (bi-nation shipping volume) ----
    // Supplier nation × customer nation × ship year over two shipping
    // years; top-20 flows by revenue. lineitem⋈orders is the big-big
    // SMJ on orderkey; supplier and nation broadcast; customer joins on
    // the shuffled custkey. Money math is scaled-integer (long sums
    // commute ⇒ order-exact, q10 precedent); the top-20 boundary orders
    // by the exact scaled revenue, never the rounded output.
    "q11_nation_volume" -> ((s, d) => {
      val nat = t(s, d, "nation").select("n_nationkey", "n_name")
      val sup = t(s, d, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = t(s, d, "customer")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1999-01-01"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).as("l_year"),
          (round(col("l_extendedprice") * 100).cast("long") *
           round((lit(1.0) - col("l_discount")) * 100).cast("long"))
            .as("rev_scaled"))
      li.join(t(s, d, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sum(col("rev_scaled")).as("rs"))
        .orderBy(col("rs").desc, col("supp_nation"), col("cust_nation"),
          col("l_year"))
        .limit(20)
        .select(col("supp_nation"), col("cust_nation"), col("l_year"),
          round(col("rs").cast("double") / 10000.0, 2).as("revenue"))
    }),

    // ---- r7: deterministic label propagation (community detection) ----
    // Three synchronous LPA rounds on the r5 topology (8-clique + pendant
    // chain on supplier keys): every node adopts its neighbors' most
    // frequent label, ties to the smallest. Votes are exact longs, the
    // argmax is one struct-min, and the round count is fixed — so the
    // oracle replays the identical relational algebra, unrolled three
    // times. The operator itself is the generic distributed fixpoint
    // (one shuffle per round, no collect).
    "r7_label_prop" -> ((s, d) => {
      val sup = t(s, d, "supplier").select(col("s_suppkey").as("key"))
      val clique = sup.filter(col("key") <= 7)
      val cedges = clique.select(col("key").as("a"))
        .join(clique.select(col("key").as("b")), col("a") < col("b"))
      val chain = sup.select(col("key").as("a"), (col("key") + 1).as("b"))
        .filter(col("a") >= 7)
        .join(sup.select(col("key").as("b")), Seq("b"), "left_semi")
        .select("a", "b")
      Components.labelPropagation(s, cedges.union(chain), rounds = 3)
        .select(col("node").as("s_suppkey"), col("label"))
        .orderBy("s_suppkey")
    }),

    // ---- st6: streaming sliding-window aggregate ----
    // The overlapping-window state shape (every event updates TWO window
    // states); the Complete-mode memory sink's final table must equal the
    // batch e5 aggregate of the whole log. NO per-file wave cap: windowed
    // aggregation state is mergeable, so the Complete-mode table is
    // wave-count-invariant by construction — an extra micro-batch buys
    // only state-store commits, not coverage (watermark eviction across
    // batches is st7's job, windowed re-open st4/st12's).
    "st6_stream_sliding" -> ((s, d) => {
      val dir = stagedTimeWaves(s, d)
      val schema = graft.streaming.EventStream.cachedSchema(s, dir)
      val stream = EventStream.normalize(s.readStream.schema(schema)
        .parquet(dir))
      val agg = EventStream.slidingAgg(stream)
      Extended18.runToCompletion(s, agg, "st6_mem", OutputMode.Complete(),
          noDataBatches = false) // Complete mode: every batch emits all
        .orderBy("win_start", "event_type")
    })
  )

  // exact replica helpers for the tp8 oracle — same text as the proven
  // ann_ivf restatement (LlmQueries), with `v` spanning the WHOLE table
  // (semDedup has no held-out query vector)
  private def cosF(a: String, b: String) =
    s"${OracleSql.dotFold(a, b)} / sqrt(${OracleSql.dotFold(a, a)} * ${OracleSql.dotFold(b, b)})"
  private def lloyd(prev: String, asn: String, upd: String, next: String) =
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

  val oracleSql: Map[String, String] = Map(
    "tp8_semdedup" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
                     FROM embeddings),
         c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, ev AS cv
               FROM (SELECT * FROM v ORDER BY vec_id LIMIT 16)),
         ${lloyd("c0", "a0", "u0", "c1")},
         ${lloyd("c1", "a1", "u1", "c2")},
         asn AS (SELECT vec_id, cid FROM (
                   SELECT vec_id, cid, row_number() OVER (
                     PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
                   FROM (SELECT vec_id, cid, ${cosF("ev", "cv")} AS cs
                         FROM v CROSS JOIN c2)) WHERE rn = 1),
         m AS (SELECT v.vec_id, ev, cid FROM v JOIN asn USING (vec_id)),
         dup AS (SELECT DISTINCT b.vec_id
                 FROM (SELECT vec_id, ev AS ea, cid FROM m) a
                 JOIN (SELECT vec_id, ev AS eb, cid FROM m) b
                   ON a.cid = b.cid AND a.vec_id < b.vec_id
                 WHERE ${OracleSql.cosExact("ea", "eb")} > 0.45)
         SELECT vec_id, CAST(cid AS INT) AS cid FROM m
         WHERE vec_id NOT IN (SELECT vec_id FROM dup)
         ORDER BY vec_id""",
    "q11_nation_volume" ->
      """WITH li AS (
           SELECT l_orderkey, l_suppkey,
             CAST(year(l_shipdate) AS INT) AS l_year,
             CAST(round(l_extendedprice * 100) AS BIGINT) *
             CAST(round((1.0 - l_discount) * 100) AS BIGINT) AS rev_scaled
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate < TIMESTAMP '1999-01-01'),
         f AS (
           SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
             li.l_year, li.rev_scaled
           FROM li
           JOIN orders ON l_orderkey = o_orderkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ns ON s_nationkey = ns.n_nationkey
           JOIN nation nc ON c_nationkey = nc.n_nationkey
           WHERE ns.n_name <> nc.n_name)
         SELECT supp_nation, cust_nation, l_year,
           round(CAST(sum(rev_scaled) AS DOUBLE) / 10000.0, 2) AS revenue
         FROM f GROUP BY supp_nation, cust_nation, l_year
         ORDER BY sum(rev_scaled) DESC, supp_nation, cust_nation, l_year
         LIMIT 20""",
    "r7_label_prop" -> {
      def round(prev: String, v: String, next: String) =
        s"""$v AS (SELECT e.a AS node, l.label, count(*) AS c
               FROM e JOIN $prev l ON l.node = e.b GROUP BY e.a, l.label),
           $next AS (SELECT node, label FROM (
                 SELECT node, label, row_number() OVER (
                   PARTITION BY node ORDER BY c DESC, label) AS rn FROM $v)
               WHERE rn = 1)"""
      s"""WITH sup AS (SELECT s_suppkey AS k FROM supplier),
         e0 AS (
           SELECT a.k AS a, b.k AS b FROM sup a JOIN sup b ON a.k < b.k
           WHERE a.k <= 7 AND b.k <= 7
           UNION ALL
           SELECT a.k, a.k + 1 FROM sup a JOIN sup b ON b.k = a.k + 1
           WHERE a.k >= 7),
         e AS (SELECT a, b FROM e0 UNION SELECT b AS a, a AS b FROM e0),
         l0 AS (SELECT k AS node, k AS label FROM sup),
         ${round("l0", "v1", "l1")},
         ${round("l1", "v2", "l2")},
         ${round("l2", "v3", "l3")}
         SELECT node AS s_suppkey, label FROM l3 ORDER BY node"""
    },
    "st6_stream_sliding" ->
      """WITH w AS (
           SELECT event_type, value,
             CAST(floor(floor(epoch(ts)) / 1800) * 1800 AS BIGINT) AS s30
           FROM events),
         x AS (
           SELECT event_type, value, unnest([s30, s30 - 1800]) AS win_start FROM w)
         SELECT win_start, event_type, count(*) AS n, round(sum(value), 2) AS total
         FROM x GROUP BY win_start, event_type ORDER BY win_start, event_type"""
  )
}
