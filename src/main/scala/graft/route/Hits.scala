package graft.route

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HITS (Kleinberg hubs-and-authorities) as a relational fixpoint, in
  * UNNORMALIZED integer form.
  *
  * Classic HITS renormalizes both vectors every round, which drags a
  * global float sum — and with it a combine-order hazard — into every
  * iteration. But the normalizer cancels out of any RANKING use of the
  * scores, so this operator keeps the pure power iteration
  *
  *   h⁰ = 1;   aᵗ = Aᵀ·hᵗ⁻¹;   hᵗ = A·aᵗ
  *
  * over BIGINT counters: every round is two keyed join+sum aggregates
  * (shuffle on dst, then on src — the same mergeable-partial shape as
  * any groupBy), every intermediate is an exact integer under any
  * combine order, and the result ranking equals normalized HITS's.
  * Growth is ~(mean degree)^(2·iters) per round — callers keep `iters`
  * small (the ranking stabilizes in a few rounds on bounded-degree
  * graphs) and longs carry it; overflow past 2^63 would need degree
  * products no real catalog graph reaches at iters ≤ 3.
  *
  * At 100 TB the plan is iters·2 hash-aggregate shuffles over the edge
  * relation — no driver-side state, no per-group windows; the edge list
  * is re-read per round (cache it for few-round runs, as the caller
  * query does via the plan's natural scan reuse).
  *
  * Reference context: the reference ships centrality measures
  * (README.md:66-74); HITS completes this repo's ranking family next to
  * PageRank (`Route.pageRankStatic`), to which the same gated-oracle
  * discipline applies.
  *
  * @param edges directed edges with columns `src`, `dst`
  * @param iters full (authority, hub) update rounds, ≥ 1
  * @return one row per node that appears as src or dst:
  *         (node, hub, auth) — BIGINT scores after `iters` rounds; a
  *         pure source's auth is 0, a pure sink's hub is 0.
  */
object Hits {

  def hits(spark: SparkSession, edges: DataFrame, iters: Int): DataFrame = {
    val (hub, auth) = rounds(edges, iters, finalHub = true)
    hub.select(col("node"), col("score").as("hub"))
      .join(auth.select(col("node"), col("score").as("auth")), Seq("node"),
        "full_outer")
      .na.fill(0L, Seq("hub", "auth"))
  }

  /** Authority scores only — skips the final hub update and the
    * hub⋈auth join (an authority ranking never reads hᵗ, so computing
    * it wastes one edge join + aggregate per call).
    */
  def authorities(spark: SparkSession, edges: DataFrame, iters: Int): DataFrame =
    rounds(edges, iters, finalHub = false)._2
      .select(col("node"), col("score").as("auth"))

  private def rounds(edges: DataFrame, iters: Int, finalHub: Boolean)
      : (DataFrame, DataFrame) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // unnormalized BIGINT scores grow ~(mean degree)^(2·iters); past 4
    // rounds a high-degree graph can wrap 2^63 SILENTLY (non-ANSI sums),
    // corrupting the ranking — enforce the documented bound loudly
    require(iters <= 4,
      s"iters must be <= 4 (BIGINT power iteration overflows past ~degree^8" +
        s" products), got $iters — rescale or normalize before ranking deeper")
    // the edge relation is re-joined up to 2·iters + 1 times —
    // materialize it once and truncate lineage so upstream work (e.g. a
    // distinct over the fact table) doesn't re-run per round;
    // executor-local blocks, released with the RDD (the g10 idiom, no
    // driver round-trip)
    val e = edges.select(col("src"), col("dst")).localCheckpoint()

    // round 1 folded algebraically: h⁰ ≡ 1 on every node with an outgoing
    // edge, so a¹(d) = Σ_{(s,d) ∈ E} 1 = indeg(d) — the seed's
    // distinct+join+sum collapses to ONE aggregate over the edge list
    // (same BIGINT values, one edge shuffle and the seed distinct saved)
    var auth: DataFrame = e.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("score"))
    var hub: DataFrame = null
    if (finalHub || iters > 1)
      hub = e.join(auth.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src").as("node")).agg(sum("score").as("score"))
    for (it <- 2 to iters) {
      // aᵗ(d) = Σ_{(s,d) ∈ E} hᵗ⁻¹(s)
      auth = e.join(hub.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum("score").as("score"))
      // hᵗ(s) = Σ_{(s,d) ∈ E} aᵗ(d) — skippable on the last round when
      // the caller only ranks authorities
      if (finalHub || it < iters)
        hub = e.join(auth.withColumnRenamed("node", "dst"), Seq("dst"))
          .groupBy(col("src").as("node")).agg(sum("score").as("score"))
    }
    (hub, auth)
  }
}
