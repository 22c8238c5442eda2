package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-99: rank-sum test + mutual information, pinned to local replays. */
class Extended99Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("a48 U and z match a local midrank computation") {
    val row = graft.queries.Extended99.queries("a48_mann_whitney")(spark, d)
      .collect().head
    val xs = graft.Tables.t(spark, d, "events")
      .filter(col("event_type").isin("purchase", "click"))
      .select(round(col("value") * 100).cast("long").as("x"),
        (col("event_type") === "purchase").as("g"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val n1 = xs.count(_._2).toLong
    val n2 = xs.count(!_._2).toLong
    val n = n1 + n2
    // midranks of the pooled sample, then R1 = sum over group 1
    val sorted = xs.map(_._1).sorted
    val midrank = sorted.zipWithIndex.groupBy(_._1).map { case (v, ps) =>
      v -> ps.map(_._2 + 1).sum.toDouble / ps.length
    }
    val r1 = xs.filter(_._2).map(t => midrank(t._1)).sum
    val u = r1 - n1 * (n1 + 1) / 2.0
    val ties = xs.groupBy(_._1).values.map(_.length.toLong)
    val tieTerm = ties.map(t => t * t * t - t).sum
    val mu = n1 * n2 / 2.0
    val sigma = math.sqrt(n1 * n2 / 12.0 *
      ((n + 1).toDouble - tieTerm.toDouble / (n * (n - 1)).toDouble))
    assert(row.getAs[Long]("n1") == n1 && row.getAs[Long]("n2") == n2)
    assert(row.getAs[Long]("tie_term") == tieTerm)
    assert(row.getAs[Double]("u") == u)
    assert(math.abs(row.getAs[Double]("z") - r6((u - mu) / sigma)) < 1e-9)
    // the test must actually see ties for the correction to be load-bearing
    assert(tieTerm >= 0 && n1 > 0 && n2 > 0)
  }

  test("a49 MI matches a local contingency fold and NMI is in [0, 1]") {
    val row = graft.queries.Extended99.queries("a49_mutual_info")(spark, d)
      .collect().head
    val cells = graft.Tables.t(spark, d, "orders")
      .groupBy("o_orderpriority", "o_orderstatus").count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val nTot = cells.map(_._2).sum
    val rM = cells.groupBy(_._1._1).map { case (k, v) => k -> v.map(_._2).sum }
    val cM = cells.groupBy(_._1._2).map { case (k, v) => k -> v.map(_._2).sum }
    val mi = cells.sortBy(_._1).map { case ((p, st), o) =>
      (o.toDouble / nTot) *
        math.log((o * nTot).toDouble / (rM(p) * cM(st)).toDouble)
    }.sum
    def ent(m: Map[String, Long]) = m.toSeq.sortBy(_._1).map { case (_, c) =>
      -(c.toDouble / nTot) * math.log(c.toDouble / nTot)
    }.sum
    assert(row.getAs[Long]("n") == nTot)
    assert(math.abs(row.getAs[Double]("mi_nats") - mi) < 1e-8)
    val nmi = row.getAs[Double]("nmi")
    assert(math.abs(nmi - mi / math.sqrt(ent(rM) * ent(cM))) < 1e-8)
    assert(nmi >= 0.0 && nmi <= 1.0)
  }
}
