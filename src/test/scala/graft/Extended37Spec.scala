package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-37 hotspot clustering against a local recomputation at sf0.001
  * (DuckDB hash gate at sf0.01 via Verify/oracle_check).
  */
class Extended37Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  test("g10 clusters equal a local union-find over dense cells") {
    val got = graft.queries.Extended37.queries("g10_hotspot_clusters")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length > 1, "fixture must yield multiple clusters")
    // local recomputation
    val pts = Tables.t(spark, d, "events")
      .filter(col("event_type") === "click")
      .select(col("value"), col("user_id")).collect()
      .map(r => (math.floor(r.getDouble(0) / 10).toLong,
        math.floor(r.getLong(1) * 4.0 / 10).toLong))
    val cells = pts.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val t0 = cells.values.sum; val nc = cells.size
    val dense = cells.filter { case (_, n) => n * nc * 2 > 3 * t0 }
    val ids = dense.keys.map { case (cx, cy) => (cx, cy) -> (cx * 1000003L + cy) }.toMap
    // union-find over 8-adjacency
    val parent = scala.collection.mutable.Map(ids.values.map(i => i -> i).toSeq: _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    for (((cx, cy), ia) <- ids; dx <- -1 to 1; dy <- -1 to 1) {
      ids.get((cx + dx, cy + dy)).foreach { ib =>
        val (ra, rb) = (find(ia), find(ib))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    val want = dense.toSeq.groupBy { case ((cx, cy), _) => find(ids((cx, cy))) }
      .map { case (root, cs) =>
        // cluster label is the min member id (the GraphX CC contract)
        val label = cs.map { case (k, _) => ids(k) }.min
        (label, cs.size.toLong, cs.map(_._2).sum)
      }.toSeq.sortBy(_._1)
    assert(got.toSeq.sortBy(_._1) == want)
  }
}
