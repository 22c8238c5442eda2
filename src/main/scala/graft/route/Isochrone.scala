package graft.route

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Isochrone / walkshed: every node within network cost `cutoff` of a
  * source, with its exact shortest network distance — the reference's
  * home use case (ref `README.md:60-74`: entwiner exists to answer
  * "what can this pedestrian reach?" over sidewalk graphs; the cutoff
  * variant of its cost-function routing).
  *
  * Same two-path dispatch as [[Route.shortestPath]]:
  *
  *  - Below the gate, a driver Dijkstra that STOPS at the cutoff — the
  *    frontier never leaves the walkshed, so cost is proportional to the
  *    reachable subgraph, not the whole graph.
  *  - Above it, bounded frontier relaxation: per round one join of the
  *    improved frontier against the symmetric edge relation + a min
  *    partial agg, discarding candidates beyond the cutoff BEFORE the
  *    shuffle (the cutoff is the pruning predicate, applied map-side).
  *    With positive weights the round count is bounded by
  *    cutoff / min(weight); state is one row per reached node.
  *
  * At 100 TB the isochrone is frontier-local by nature — the cutoff
  * bounds the touched subgraph regardless of graph size, which is what
  * makes walkshed queries cheap on planetary graphs when the edge
  * relation is partitioned by source node.
  */
object Isochrone {

  /** Nodes within `cutoff` of `source` over the undirected weighted
    * edges (u, v, w ≥ 0). Returns (node, dist) including the source at
    * distance 0.
    */
  def isochrone(spark: SparkSession, edges: DataFrame, source: Long,
      cutoff: Double, maxLocalEdges: Long = Route.LocalPathMaxEdges,
      maxRounds: Int = 512): DataFrame = {
    import spark.implicits._
    val canon = edges.select(col("u").cast("long"), col("v").cast("long"),
      col("w").cast("double")).filter(col("u") =!= col("v"))
    val edgeCount = canon.limit((maxLocalEdges + 1).min(Int.MaxValue - 1L).toInt)
      .count()
    if (edgeCount <= maxLocalEdges) {
      val es = canon.as[(Long, Long, Double)].collect()
      return isochroneLocal(es, source, cutoff).toSeq.toDF("node", "dist")
    }
    isochroneDistributed(spark, canon, source, cutoff, maxRounds)
  }

  /** Cutoff Dijkstra over the collected edges. */
  private[graft] def isochroneLocal(edges: Array[(Long, Long, Double)],
      source: Long, cutoff: Double): Array[(Long, Double)] = {
    val adj = mutable.Map.empty[Long, List[(Long, Double)]]
      .withDefaultValue(Nil)
    edges.foreach { case (u, v, w) =>
      adj(u) ::= ((v, w)); adj(v) ::= ((u, w))
    }
    val dist = mutable.Map(source -> 0.0)
    val pq = mutable.PriorityQueue((0.0, source))(
      Ordering.by[(Double, Long), Double](_._1).reverse)
    while (pq.nonEmpty) {
      val (d0, n) = pq.dequeue()
      if (d0 <= dist(n)) {
        adj(n).foreach { case (m, w) =>
          val nd = d0 + w
          if (nd <= cutoff && nd < dist.getOrElse(m, Double.PositiveInfinity)) {
            dist(m) = nd; pq.enqueue((nd, m))
          }
        }
      }
    }
    dist.toArray.sortBy(_._1)
  }

  /** Bounded frontier relaxation (see object doc). */
  private def isochroneDistributed(spark: SparkSession, canon: DataFrame,
      source: Long, cutoff: Double, maxRounds: Int): DataFrame = {
    import spark.implicits._
    val sym = canon.select(col("u").as("a"), col("v").as("b"), col("w"))
      .union(canon.select(col("v").as("a"), col("u").as("b"), col("w")))
      .localCheckpoint()
    var best = Seq((source, 0.0)).toDF("node", "dist").localCheckpoint()
    var frontier = best
    var rounds = 0
    var live = true
    while (rounds < maxRounds && live) {
      val cand = frontier.join(sym, frontier("node") === sym("a"))
        .select(col("b").as("node"), (col("dist") + col("w")).as("nd"))
        .filter(col("nd") <= cutoff) // map-side cutoff prune
        .groupBy("node").agg(min("nd").as("nd"))
      val improved = cand.join(best.select(col("node"), col("dist").as("old")),
          Seq("node"), "left")
        .filter(col("old").isNull || col("nd") < col("old"))
        .select(col("node"), col("nd").as("dist"))
        .localCheckpoint()
      if (improved.isEmpty) live = false
      else {
        val prev = best
        best = best.join(improved.select(col("node"), col("dist").as("nd")),
            Seq("node"), "full_outer")
          .select(col("node"),
            when(col("nd").isNull, col("dist"))
              .when(col("dist").isNull, col("nd"))
              .otherwise(least(col("dist"), col("nd"))).as("dist"))
          .localCheckpoint()
        prev.unpersist(blocking = false)
        frontier.unpersist(blocking = false)
        frontier = improved
      }
      rounds += 1
    }
    require(!live, s"isochrone: no convergence in $maxRounds rounds " +
      "(zero-weight cycle?)")
    best
  }
}
