package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-96: personalized PageRank, Adamic–Adar, cross-source OOV —
  * each pinned to a local definitional replay.
  */
class Extended96Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r4(x: Double) =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("r14 personalized PageRank matches a local 3-iteration power walk") {
    val got = graft.queries.Extended96.queries("r14_ppr_chain")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = got.size
    val keys = got.keys.toSeq.sorted
    // local replay on the bidirected unit chain over the key INDEX
    val idx = keys.zipWithIndex.toMap
    def od(i: Int) = if (i == 0 || i == n - 1) 1 else 2
    var r = Array.tabulate(n)(i => if (i == 0) 1.0 else 0.0)
    for (_ <- 1 to 3) {
      val next = Array.tabulate(n) { i =>
        var s = 0.0
        if (i > 0) s += r(i - 1) / od(i - 1)
        if (i < n - 1) s += r(i + 1) / od(i + 1)
        0.15 * (if (i == 0) 1.0 else 0.0) + 0.85 * s
      }
      r = next
    }
    keys.foreach { k => assert(got(k) == r6(r(idx(k))), s"key $k") }
    // mass stays near 1 and the seed end dominates
    assert(math.abs(r.sum - 1.0) < 0.3 && got(keys.head) > got(keys.last))
  }

  test("j27 Adamic-Adar matches a local wedge count with the pinned fold") {
    val got = graft.queries.Extended96.queries("j27_adamic_adar")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val edges = graft.queries.Extended42.sparseSupernodeEdges(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val deg = adj.map { case (k, vs) => k -> vs.size.toLong }
    val cand = (for {
      (u, nu) <- adj.toSeq; (v, nv) <- adj.toSeq
      if u < v && !edges((u, v))
      common = (nu & nv).toSeq if common.nonEmpty
    } yield {
      val ds = common.map(deg).sorted
      val aa = ds.foldLeft(0.0)((acc, x) => acc + 1.0 / math.log(x.toDouble))
      ((u, v), (common.size.toLong, aa))
    }).toMap
    assert(got.nonEmpty)
    got.foreach { case (pair, (cn, aa)) =>
      assert(cand(pair)._1 == cn, s"$pair cn")
      assert(r4(cand(pair)._2) == aa, s"$pair aa")
    }
    // top-20 selection: no excluded pair may beat an included one on cn
    val minIncluded = got.values.map(_._1).min
    val excludedMax = cand.filterNot(c => got.contains(c._1))
      .values.map(_._1).maxOption.getOrElse(0L)
    assert(excludedMax <= minIncluded)
  }

  test("tp37 OOV matrix matches local vocabulary sets; diagonal is zero") {
    val got = graft.queries.Extended96.queries("tp37_cross_source_oov")(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val docs = graft.Tables.t(spark, d, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val words = docs.flatMap { case (src, text) =>
      text.split(" ", -1).map(w => (src, w)) }
    val vocab = words.groupBy(_._1).map { case (s, ws) => s -> ws.map(_._2).toSet }
    val counts = words.groupBy(identity).map { case (k, vs) => k -> vs.length.toLong }
    val tot = words.groupBy(_._1).map { case (s, ws) => s -> ws.length.toLong }
    val srcs = vocab.keys.toSeq.sorted
    assert(got.size == srcs.size * srcs.size)
    for (a <- srcs; b <- srcs) {
      val oov = counts.collect {
        case ((`b`, w), c) if !vocab(a)(w) => c }.sum
      val (gotOov, gotTot, rate) = got((a, b))
      assert(gotOov == oov && gotTot == tot(b), s"($a, $b)")
      assert(rate == r6(oov.toDouble / tot(b)), s"($a, $b) rate")
      if (a == b) assert(gotOov == 0L)
    }
    // off-diagonal cells must be non-trivial for the matrix to mean anything
    assert(got.exists { case ((a, b), (o, _, _)) => a != b && o > 0 })
  }
}
