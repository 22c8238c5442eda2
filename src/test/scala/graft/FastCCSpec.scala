package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.FastCC

/** FastCC's forest-contraction path replaced the GraphX Pregel CC at five
  * call sites (g10, j10, dedup clusters, bridge forests, MST contraction):
  * both paths must agree label-for-label (component named by its minimum
  * member id) on randomized graphs, or the swap silently changes query
  * results.
  */
class FastCCSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def viaFast(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    FastCC.labels(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def viaGraphX(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    // forcing the gate to 0 routes FastCC onto its GraphX fallback — the
    // exact code the contraction replaced
    FastCC.labels(edges.toDF("a", "b"), maxSingleTask = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches GraphX labels on randomized graphs (both branches live)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 30 + rnd.nextInt(200)
      val m = 20 + rnd.nextInt(400)
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val fast = viaFast(edges)
      val gx = viaGraphX(edges)
      assert(fast == gx, s"trial $trial: fast $fast vs graphx $gx")
    }
  }

  test("chain, self-loop, duplicate edges, two components") {
    val edges = Seq[(Long, Long)](
      (5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L), // chain labeled 1
      (7L, 7L),                               // self-loop singleton
      (9L, 8L), (9L, 8L), (8L, 9L))           // dup + reversed pair
    val got = viaFast(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      7L -> 7L, 8L -> 8L, 9L -> 8L))
    assert(got == viaGraphX(edges))
  }

  test("empty edge list yields empty labels") {
    assert(viaFast(Seq.empty) == Map.empty)
  }

  test("local union-find labels by component minimum") {
    val got = FastCC.unionFind(Iterator((10L, 20L), (20L, 5L), (30L, 40L)))
      .toMap
    assert(got == Map(10L -> 5L, 20L -> 5L, 5L -> 5L, 30L -> 30L, 40L -> 30L))
  }
}
