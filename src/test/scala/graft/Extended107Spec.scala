package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-107: BH-FDR + Heaps' law, pinned to local replays. */
class Extended107Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  private def erfcAS(x: Double): Double = {
    val t = 1.0 / (1.0 + 0.3275911 * x)
    (t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 +
      t * (-1.453152027 + t * 1.061405429))))) * math.exp(-(x * x))
  }

  test("a54 p-values, ranks and the BH discovery set match a local replay") {
    val got = graft.queries.Extended107.queries("a54_bh_fdr")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5), r.getBoolean(6)))
    val xs = graft.Tables.t(spark, d, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val types = xs.map(_._1).distinct.sorted
    val stats = types.map { ty =>
      val mine = xs.filter(_._1 == ty).map(_._2)
      val rest = xs.filter(_._1 != ty).map(_._2)
      def v(a: Array[Long]) = {
        val n = a.length.toLong
        val s = a.map(BigInt(_)).sum
        val ss = a.map(x => BigInt(x) * BigInt(x)).sum
        ((BigInt(n) * ss - s * s).toDouble / (n * (n - 1)).toDouble / n,
          s.toDouble / n, n)
      }
      val (v1, m1, n1) = v(mine)
      val (v2, m2, _) = v(rest)
      val z = (m1 - m2) / math.sqrt(v1 + v2)
      (ty, n1, z, erfcAS(math.abs(z) / math.sqrt(2.0)))
    }
    val ranked = stats.sortBy(s => (s._4, s._1)).zipWithIndex
    val m = ranked.length
    val kstar = ranked.filter { case (s, i) =>
      s._4 <= 0.05 * (i + 1) / m
    }.map(_._2 + 1).sorted.lastOption.getOrElse(0)
    got.foreach { case (ty, n, z, p, rank, cutoff, disc) =>
      val (s, i) = ranked.find(_._1._1 == ty).get
      assert(n == s._2, s"$ty n")
      assert(rank == i + 1, s"$ty rank")
      assert(math.abs(z - s._3) < 1e-5, s"$ty z")
      assert(math.abs(p - s._4) < 1e-8, s"$ty p")
      assert(math.abs(cutoff - 0.05 * rank / m) < 1e-9, s"$ty cutoff")
      assert(disc == (rank <= kstar), s"$ty discovered")
    }
    // BH monotonicity: the discovery set is a prefix of the ranking
    val flags = got.sortBy(_._5).map(_._7)
    assert(!flags.sliding(2).exists(p => !p.head && p.last))
  }

  test("t33 beta matches a local log-log OLS over the t23 checkpoints") {
    val row = graft.queries.Extended107.queries("t33_heaps_law")(spark, d)
      .collect().head
    val docs = graft.Tables.t(spark, d, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
      .sortBy(_._1)
    var seen = Set.empty[String]
    var nTok = 0L
    val pts = docs.flatMap { case (id, ws) =>
      nTok += ws.length
      seen = seen ++ ws
      if (id % 50 == 0) Some((math.log(nTok.toDouble),
        math.log(seen.size.toDouble)))
      else None
    }
    val k = pts.length
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val beta = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert(row.getAs[Long]("k_checkpoints") == k.toLong)
    assert(math.abs(row.getAs[Double]("beta") - beta) < 1e-5)
    // Heaps' exponent of natural-ish text sits strictly inside (0, 1)
    assert(row.getAs[Double]("beta") > 0.0 && row.getAs[Double]("beta") < 1.0)
    assert(row.getAs[Double]("k_coef") > 0.0)
  }
}
