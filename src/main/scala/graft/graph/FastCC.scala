package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected-component labels over an undirected edge list, label = the
  * component's minimum vertex id — exactly `Graph.fromEdgeTuples(...)
  * .connectedComponents().vertices` (every src/dst endpoint appears; no
  * other vertices exist).
  *
  * The repo's CC consumers (g10 hotspot cells, j10 order trees, near-dup
  * pair clusters, bridge forests, MST contraction) all run CC over a
  * SUMMARY graph that is orders of magnitude smaller than the relation it
  * was derived from, yet each paid GraphX's per-superstep scheduler
  * barrier O(diameter) times — profiled at 2-4 s per call at sf0.1 for
  * graphs of a few hundred to a few hundred thousand edges. This replaces
  * the iteration with the classic two-level spanning-forest contraction:
  *
  *   1. per-partition union-find emits a star forest (≤ one edge per
  *      local vertex) — narrow, no shuffle;
  *   2. the forests merge in ONE single-task union-find — |forest| ≤
  *      |V(pairs)| entries, gated by [[MaxSingleTaskEdges]].
  *
  * Two jobs total (pair materialization + the consumer's action) instead
  * of O(diameter) supersteps. Above the gate the original GraphX Pregel
  * path runs unchanged — the 100 TB story is the same as before, the
  * single-task merge is only taken when the summary graph provably fits
  * one task's memory (the Route.LocalPathMaxEdges / j31 localGate
  * discipline).
  */
object FastCC {

  /** Forest-merge budget: 20M (vertex, root) entries ≈ a few hundred MB
    * in one task — far above any summary graph the registry produces,
    * far below executor memory. Above it, GraphX CC runs as before.
    */
  val MaxSingleTaskEdges: Long = 20000000L

  /** (id, label) per endpoint of `pairs` (first two columns, cast to
    * long), label = min id in the connected component. The result is
    * localCheckpoint-materialized (the call sites' existing contract:
    * labels outlive the GraphX/RDD caches they are derived from).
    */
  def labels(pairs: DataFrame, idCol: String = "id",
      labelCol: String = "label",
      maxSingleTask: Long = MaxSingleTaskEdges): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val cols = pairs.columns
    // materialize the edge list once: the gate count and the chosen path
    // both read it, and the upstream relation (often an aggregation or a
    // join) must not re-run per consumer
    val p = pairs.select(col(cols(0)).cast("long"), col(cols(1)).cast("long"))
      .localCheckpoint()
    val n = p.count()
    val out =
      if (n <= maxSingleTask) {
        val e = p.rdd.map(r => (r.getLong(0), r.getLong(1)))
        // level 1: per-partition star forests (narrow); level 2: one-task
        // merge of all forests. A star forest has ≤ one edge per distinct
        // local vertex, so the merge input is ≤ |V| pairs, bounded by the
        // gate above.
        val forest = e.mapPartitions(unionFind)
        val labelsRdd =
          if (forest.getNumPartitions <= 1) forest
          else forest.repartition(1).mapPartitions(unionFind)
        labelsRdd.toDF(idCol, labelCol).localCheckpoint()
      } else {
        // beyond the single-task budget: the unchanged GraphX fixpoint,
        // partition count scaled to the edge count (~1M edges/partition,
        // capped at the session parallelism — the Dedup.clusters sizing)
        val parts = math.max(1L, math.min(
          spark.sparkContext.defaultParallelism.toLong, n / 1000000L + 1L)).toInt
        val g = org.apache.spark.graphx.Graph.fromEdgeTuples(
          p.rdd.map(r => (r.getLong(0), r.getLong(1))).coalesce(parts), 0)
        val cc = g.connectedComponents()
        val labels = cc.vertices.toDF(idCol, labelCol).localCheckpoint()
        cc.unpersist(blocking = false)
        g.unpersist(blocking = false)
        labels
      }
    p.unpersist(blocking = false)
    out
  }

  /** Union-find over an edge iterator; emits (member, root) for every
    * vertex seen, root = the component's minimum member. Attach-larger-
    * root-under-smaller plus path compression keeps the root the minimum
    * at every step, so the emitted labels ARE the min-id labels.
    */
  private[graft] def unionFind(
      edges: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x0: Long): Long = {
      var r = x0
      while (parent(r) != r) r = parent(r)
      // path compression
      var x = x0
      while (parent(x) != r) { val nx = parent(x); parent(x) = r; x = nx }
      r
    }
    edges.foreach { case (a, b) =>
      if (!parent.contains(a)) parent(a) = a
      if (!parent.contains(b)) parent(b) = b
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    // pin the key set before the final finds (find() compresses paths,
    // mutating values mid-iteration; keys never change, but be explicit)
    val ks = parent.keysIterator.toArray
    ks.iterator.map(v => (v, find(v)))
  }
}
