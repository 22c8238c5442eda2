package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.llm.Dedup
import graft.route.Components

/** Batch-22 kernels: clustering coefficient against a local recount,
  * quality-canonical near-dedup policy vs the min-id policy, and the
  * ntile binning invariants.
  */
class Extended22Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def localCoeff(
      edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Double)] = {
    val sym = edges.filter(e => e._1 != e._2).flatMap(e => Seq(e, e.swap)).distinct
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    adj.map { case (n, ns) =>
      val t = ns.toSeq.sorted.combinations(2)
        .count { case Seq(x, y) => adj(x)(y) }
      val d = ns.size
      n -> (d.toLong, t.toLong,
        if (d >= 2) 2.0 * t / (d * (d - 1)) else 0.0)
    }.toMap
  }

  test("clusteringCoefficient equals a local recount on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(120)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .distinct
    val got = Components.clusteringCoefficient(spark, edges.toDF("u", "v"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val want = localCoeff(edges)
    assert(got.keySet == want.keySet)
    for ((n, (d, t, c)) <- want) {
      assert(got(n)._1 == d, s"degree of $n")
      assert(got(n)._2 == t, s"triangles of $n")
      assert(got(n)._3 == c, s"coeff of $n") // same IEEE expression both sides
    }
  }

  test("clusteringCoefficient: clique is 1.0, path is 0.0") {
    import spark.implicits._
    val clique = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val path = Seq((10L, 11L), (11L, 12L))
    val got = Components
      .clusteringCoefficient(spark, (clique ++ path).toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert((1L to 4L).forall(got(_) == 1.0))
    assert(Seq(10L, 11L, 12L).forall(got(_) == 0.0))
  }

  test("dedupNearKeepBest keeps the longest per cluster, min id on ties") {
    import spark.implicits._
    val mk = (n: Int) => (1 to n).map(i => s"alpha bravo charlie delta echo w$i")
      .mkString(" ")
    val base = "the quick brown fox jumps over the lazy dog again and again " * 4
    val docs = Seq(
      (1L, base + "tail one"),          // cluster A, short
      (2L, base + "tail one two three four"), // cluster A, LONGEST
      (3L, base + "tail one two"),      // cluster A, middle
      (10L, mk(30)), (11L, mk(30)),     // cluster B: exact dups, equal length
      (20L, "completely different singleton text about graphs and spark"),
      (21L, "another unrelated document mentioning parquet and shuffles"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val kept = Dedup.dedupNearKeepBest(docs, "doc_id", "text", "n_chars",
        threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 10L, 20L, 21L), s"got $kept")
    // the min-id policy keeps 1 instead of 2 on cluster A — the two
    // policies agree on clusters, differ only in the representative
    val minId = Dedup.dedupNear(docs, "doc_id", "text", threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(minId == Set(1L, 10L, 20L, 21L), s"got $minId")
  }

  test("w9 binning: bins are equal-frequency within one and cover all rows") {
    val d = "/root/testdata/sf0.001"
    val out = graft.queries.Extended22.queries("w9_ntile_binning")(spark, d)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val total = out.map(_._3).sum
    assert(total == Tables.t(spark, d, "orders").count())
    for ((prio, rows) <- out.groupBy(_._1)) {
      val ns = rows.map(_._3)
      assert(ns.max - ns.min <= 1, s"$prio bins skewed: ${ns.toSeq}")
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length).toSeq)
    }
  }
}
