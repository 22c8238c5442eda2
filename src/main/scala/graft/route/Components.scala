package graft.route

import org.apache.spark.graphx.{Edge => GXEdge, Graph => GXGraph}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Strongly connected components over a (u, v) long-keyed edge relation —
  * the remaining classic graph fixpoint next to the Route centralities
  * (ref `README.md:66-68` "graph algorithms ... via the networkx
  * protocol"; nx exposes `strongly_connected_components`).
  *
  * Same two-path dispatch as [[Route.shortestPath]]: GraphX
  * `stronglyConnectedComponents` is the scale path (min-label propagation,
  * converges in O(longest cycle) supersteps), but its per-superstep
  * scheduling overhead dwarfs the work on interactive-sized graphs, where
  * one driver-side iterative Tarjan pass over the collected edge list is
  * exact and effectively free. Both paths label every component by its
  * smallest member id, so results are identical (ComponentsSpec pins
  * local == GraphX with the gate forced off).
  */
object Components {

  /** SCC labels for `nodes` (single long column) under `edges` (u, v long
    * columns). Returns (node, scc_id) with scc_id = min node id in the
    * component. Edges mentioning ids outside `nodes` must be pre-filtered
    * by the caller (GraphX would auto-create such vertices; Tarjan would
    * not — requiring the filter keeps the two paths agreeing).
    */
  def scc(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
      maxLocalEdges: Long = Route.LocalPathMaxEdges,
      numIter: Int = 64): DataFrame = {
    import spark.implicits._
    val edgeCount = edges.count()
    if (edgeCount <= math.min(maxLocalEdges, Route.LocalPathMaxEdges)) {
      val ns = nodes.as[Long].collect()
      val es = edges.as[(Long, Long)].collect()
      return sccLocal(ns, es).toSeq.toDF("node", "scc_id")
    }
    val vr = nodes.as[Long].rdd.map(u => (u, 0))
    val er = edges.as[(Long, Long)].rdd
      .map { case (u, v) => GXEdge(u, v, 0) }
    val g = GXGraph(vr, er, 0)
    try g.stronglyConnectedComponents(numIter).vertices.toDF("node", "scc_id")
    finally g.unpersist(blocking = false)
  }

  /** Iterative (explicit-stack) Tarjan — recursion-free so the gate's
    * ceiling (200k edges) cannot overflow the JVM stack on a long path.
    * Components are labeled by their minimum member id, matching GraphX.
    */
  def sccLocal(nodes: Array[Long], edges: Array[(Long, Long)]): Map[Long, Long] = {
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.length
    val adj = Array.fill(n)(List.empty[Int])
    edges.foreach { case (u, v) =>
      (idx.get(u), idx.get(v)) match {
        case (Some(i), Some(j)) => adj(i) ::= j
        case _ => throw new IllegalArgumentException(
          s"edge ($u,$v) references a node outside the node set")
      }
    }
    val index = Array.fill(n)(-1)
    val lowlink = new Array[Int](n)
    val onStack = new Array[Boolean](n)
    val stack = scala.collection.mutable.ArrayDeque.empty[Int]
    val label = new Array[Long](n)
    var counter = 0
    // work stack frames: (vertex, remaining successors)
    val work = scala.collection.mutable.ArrayDeque.empty[(Int, List[Int])]
    for (root <- 0 until n if index(root) == -1) {
      work.prepend((root, adj(root)))
      index(root) = counter; lowlink(root) = counter; counter += 1
      stack.prepend(root); onStack(root) = true
      while (work.nonEmpty) {
        val (v, succs) = work.removeHead()
        succs match {
          case w :: rest =>
            work.prepend((v, rest))
            if (index(w) == -1) {
              index(w) = counter; lowlink(w) = counter; counter += 1
              stack.prepend(w); onStack(w) = true
              work.prepend((w, adj(w)))
            } else if (onStack(w)) {
              lowlink(v) = math.min(lowlink(v), index(w))
            }
          case Nil =>
            if (lowlink(v) == index(v)) {
              // pop the component, label with its min node id
              val members = scala.collection.mutable.ListBuffer.empty[Int]
              var w = -1
              while (w != v) {
                w = stack.removeHead(); onStack(w) = false; members += w
              }
              val lbl = members.iterator.map(nodes).min
              members.foreach(m => label(m) = lbl)
            }
            // propagate lowlink to the parent frame, if any
            work.headOption.foreach { case (p, _) =>
              lowlink(p) = math.min(lowlink(p), lowlink(v))
            }
        }
      }
    }
    nodes.indices.iterator.map(i => nodes(i) -> label(i)).toMap
  }
}
