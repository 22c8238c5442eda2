package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-8 batch 121: densest subgraph by parallel peeling — the
  * published MapReduce formulation (Bahmani, Kumar, Vassilvitskii,
  * VLDB'12: repeatedly delete every node whose degree is at most the
  * removal factor times the current average-degree density; the best
  * density seen across rounds approximates the optimum). Completes the
  * dense-substructure family beside j17 k-core and j21 k-truss: k-core
  * fixes the degree bound, k-truss the edge support, densest-subgraph
  * OPTIMIZES the density itself — the community-core / spam-cluster
  * primitive.
  *
  * j31_densest_subgraph, on j9's co-order part graph:
  *  - Exactly [[Rounds]] synchronous peeling rounds (the shared
  *    constant both engines unroll — the j21 discipline). Each round
  *    records (n, m) of the current subgraph, then removes every node
  *    with deg ≤ 2·(m/n) — evaluated as the INTEGER cross-product
  *    deg·n ≤ 2·m, so no float decides a removal. An emptied graph
  *    makes the remaining rounds no-ops in both engines.
  *  - The answer is the best-density round: densities m/n are the same
  *    IEEE doubles on both engines (same exact integers), so the
  *    (density desc, round asc) argmax cannot drift. The per-round
  *    (n, m) trace is a ≤[[Rounds]]-row bounded artifact — the driver
  *    walk over it is the Selection/IVF precedent.
  *
  * Scale shape: each round is one degree aggregation + one semi-join
  * over a monotonically SHRINKING edge relation (the k-truss argument);
  * the factor-2 threshold halves-or-better the surviving mass per
  * round on average-degree grounds, so [[Rounds]] = 16 exhausts any
  * graph these tables produce (the engine short-circuits on empty; the
  * oracle's remaining stages are no-ops on empty relations).
  *
  * Reference context: no counterpart; extends the graph-ops layer
  * (j17/j21/j9) with the density-OPT primitive.
  */
object Extended121 {
  type Q = (SparkSession, String) => DataFrame

  /** Peeling rounds unrolled in BOTH engines — change in one place. */
  private[graft] val Rounds = 16

  val queries: Map[String, Q] = Map(
    "j31_densest_subgraph" -> ((s, d) => {
      val li = t(s, d, "lineitem").filter(col("l_linenumber") <= 5)
        .select("l_orderkey", "l_partkey")
      // per-order aggregate + in-stage pair generator instead of the
      // broadcast self-join (see CoOrderPairs: identical pair set, no
      // driver-side broadcast build)
      var edges = graft.operators.CoOrderPairs.undirected(li)
        .localCheckpoint()
      // ≤Rounds-row trace of (round, n, m) — a bounded driver artifact
      val trace = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
      // below this edge count the remaining rounds are pure job overhead
      // (~0.3 s each of scheduler floor on <50k rows) — collect once and
      // replay the IDENTICAL integer walk locally, the
      // Route.LocalPathMaxEdges discipline; at cluster scale the big
      // rounds stay distributed and only the peeled-down tail collects
      val localGate = 50000L
      var r = 0
      var done = false
      while (r < Rounds && !done) {
        val deg = edges.select(col("a").as("v"))
          .unionAll(edges.select(col("b").as("v")))
          .groupBy("v").agg(count(lit(1)).as("c"))
          .localCheckpoint()
        // one aggregate serves both counts: m = Σdeg / 2 (handshake)
        val nm = deg.agg(count(lit(1)).as("n"), sum("c").as("degsum")).head
        val (n, m) = (nm.getLong(0),
          if (nm.isNullAt(1)) 0L else nm.getLong(1) / 2)
        if (n == 0) done = true
        else if (m <= localGate) {
          // bounded local tail: same rounds, same integer thresholds
          var es = edges.collect().map(row => (row.getLong(0), row.getLong(1)))
            .toSet
          var rr = r
          while (rr < Rounds && es.nonEmpty) {
            val dg = (es.toSeq.map(_._1) ++ es.toSeq.map(_._2))
              .groupBy(identity).map { case (v, o) => v -> o.size.toLong }
            val nn = dg.size.toLong
            val mm = es.size.toLong
            trace += ((rr, nn, mm))
            val survive = dg.filter { case (_, c) => c * nn > 2 * mm }.keySet
            es = es.filter(e => survive(e._1) && survive(e._2))
            rr += 1
          }
          done = true
        } else {
          trace += ((r, n, m))
          // survivor iff deg·n > 2·m — integer cross-product, no float
          val survivors = deg.filter(col("c") * n > 2L * m).select("v")
          edges = edges
            .join(survivors.withColumnRenamed("v", "a"), Seq("a"), "left_semi")
            .join(survivors.withColumnRenamed("v", "b"), Seq("b"), "left_semi")
            .localCheckpoint()
          r += 1
        }
      }
      // degenerate input (no co-order edges): the oracle's
      // `WHERE n > 0 ... LIMIT 1` yields zero rows — match it instead of
      // throwing on trace.maxBy of an empty buffer
      val rows =
        if (trace.isEmpty) Seq.empty[(Int, Long, Long, Double)]
        else {
          val best = trace.maxBy { case (rr, n, m) =>
            (m.toDouble / n, -rr) } // same doubles both engines; earliest wins
          Seq((best._1, best._2, best._3,
            best._3.toDouble / best._2))
        }
      // rounding goes through the same catalyst `round` every other
      // query uses, so the display digits cannot drift from DuckDB's
      s.createDataFrame(rows)
        .toDF("best_round", "n_nodes", "n_edges", "density_raw")
        .select(col("best_round"), col("n_nodes"), col("n_edges"),
          round(col("density_raw"), 6).as("density"))
    })
  )

  val oracleSql: Map[String, String] = {
    // MATERIALIZED is load-bearing: each stage references its
    // predecessor several times, and DuckDB inlines plain CTEs — the
    // 4^stages expansion documented in SCALING.md ("Too many open
    // files" / >300 s inlined)
    def stage(k: Int) =
      s"""d$k AS MATERIALIZED (
           SELECT v, CAST(count(*) AS BIGINT) AS c FROM (
             SELECT a AS v FROM e$k UNION ALL SELECT b FROM e$k)
           GROUP BY v),
         s$k AS MATERIALIZED (
           SELECT $k AS r, CAST(count(*) AS BIGINT) AS n,
             (SELECT CAST(count(*) AS BIGINT) FROM e$k) AS m
           FROM d$k),
         e${k + 1} AS MATERIALIZED (
           SELECT e.a, e.b FROM e$k e
           JOIN d$k da ON da.v = e.a JOIN d$k db ON db.v = e.b, s$k
           WHERE da.c * s$k.n > 2 * s$k.m AND db.c * s$k.n > 2 * s$k.m)"""
    val stages = (0 until Rounds).map(stage).mkString(",\n         ")
    val union = (0 until Rounds).map(k => s"SELECT * FROM s$k")
      .mkString(" UNION ALL ")
    Map(
      "j31_densest_subgraph" ->
        s"""WITH li AS (
             SELECT l_orderkey, l_partkey FROM lineitem
             WHERE l_linenumber <= 5),
           e0 AS MATERIALIZED (
             SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
             FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
             WHERE x.l_partkey < y.l_partkey),
           $stages,
           allr AS ($union)
           SELECT r AS best_round, n AS n_nodes, m AS n_edges,
             round(CAST(m AS DOUBLE) / n, 6) AS density
           FROM allr WHERE n > 0
           ORDER BY CAST(m AS DOUBLE) / n DESC, r LIMIT 1"""
    )
  }
}
