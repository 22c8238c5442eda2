package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-84: Hodges–Lehmann pseudo-median + LSH cosine census, pinned to
  * local brute force.
  */
class Extended84Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("a40 HL estimate equals the brute-force lower median of Walsh averages") {
    val got = graft.queries.Extended84.queries("a40_hodges_lehmann")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toList
    assert(got.nonEmpty && got.map(_._1) == got.map(_._1).sorted)
    val hourly = graft.Tables.t(spark, d, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    got.foreach { case (et, nWalsh, hl) =>
      val series = hourly(et).sortBy(_._2).map(_._3)
      val sums = for {
        i <- series.indices; j <- i until series.size
      } yield series(i) + series(j)
      assert(nWalsh == sums.size.toLong, s"type=$et")
      val sorted = sums.sorted
      val med = sorted((sorted.size + 1) / 2 - 1)
      assert(hl == med.toDouble / 2.0, s"type=$et got=$hl want=${med / 2.0}")
    }
  }

  test("v10 census bins partition the same-signature pair set; cos bounds sane") {
    val got = graft.queries.Extended84.queries("v10_lsh_cosine_census")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toList
    assert(got.map(_._1) == got.map(_._1).sorted)
    got.foreach { case (bin, n, lo, hi) =>
      assert(n > 0 && lo <= hi)
      assert(lo >= bin / 10.0 - 1e-6 && hi < (bin + 1) / 10.0 + 1e-6 ||
        bin == 9L && hi <= 1.0 + 1e-9, s"bin=$bin [$lo,$hi]")
    }
    // total pairs must equal an independent signature-join recount
    val e = graft.Tables.t(spark, d, "embeddings")
      .select(col("vec_id"),
        graft.llm.Similarity.hyperplaneSignature(col("embedding"), dim = 64)
          .as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nPairs = e.groupBy(_._2).values
      .map(g => g.size.toLong * (g.size - 1) / 2).sum
    assert(got.map(_._2).sum == nPairs)
  }
}
