package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-103: silhouette + JL distortion, pinned to local replays. */
class Extended103Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  private def millis(): Array[(Long, Int, Array[Long])] =
    graft.Tables.t(spark, d, "embeddings")
      .select(col("vec_id"), col("label"),
        transform(col("embedding").cast("array<double>"),
          e => round(e * 1000).cast("long")).as("xs"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Long](2).toArray))

  test("v13 mean silhouette matches a local exact-rational computation") {
    val got = graft.queries.Extended103.queries("v13_silhouette")(spark, d)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val pts = millis()
    val byLabel = pts.groupBy(_._2)
    val cents = byLabel.map { case (l, rows) =>
      val n = rows.length.toLong
      val sv = (0 until 64).map(j => rows.map(_._3(j)).sum).toArray
      l -> (n, sv)
    }
    val sByLabel = pts.map { case (id, l, xs) =>
      def dist(c: (Long, Array[Long])): Double = {
        val q = (0 until 64).map(j => {
          val t = c._1 * xs(j) - c._2(j); t * t
        }).sum
        math.sqrt(q.toDouble) / c._1.toDouble
      }
      val a = dist(cents(l))
      val b = cents.filter(_._1 != l).values.map(dist).min
      val s = if (math.max(a, b) > 0) (b - a) / math.max(a, b) else 0.0
      (l, id, s)
    }.groupBy(_._1)
    sByLabel.foreach { case (l, rows) =>
      val mean = rows.sortBy(_._2).map(_._3).sum / rows.length
      assert(got(l)._1 == rows.length.toLong, s"label $l n")
      assert(math.abs(got(l)._2 - mean) < 1e-5, s"label $l silhouette")
    }
    // silhouette is bounded; with arbitrary labels the mean can be ≤ 0
    // (the fixture's labels carry no geometry), but never outside [−1, 1]
    assert(got.values.forall(v => v._2 >= -1.0 && v._2 <= 1.0))
  }

  test("v14 distortion ratios match a local splitmix Rademacher projection") {
    val row = graft.queries.Extended103.queries("v14_jl_distortion")(spark, d)
      .collect().head
    val pts = millis()
    val ratios = pts.flatMap { case (_, _, xs) =>
      val qx = xs.map(x => x * x).sum
      if (qx == 0) None else {
        val qy = (0 until 16).map { j =>
          val y = (0 until 64).map { p =>
            val sign = if (graft.functions.Hashing.splitmix64(j * 64L + p) % 2 == 0) 1L else -1L
            sign * xs(p)
          }.sum
          y * y
        }.sum
        Some(qy.toDouble / (16.0 * qx))
      }
    }
    assert(row.getAs[Long]("n") == ratios.length.toLong)
    assert(math.abs(row.getAs[Double]("min_ratio") - ratios.min) < 1e-6)
    assert(math.abs(row.getAs[Double]("max_ratio") - ratios.max) < 1e-6)
    assert(row.getAs[Long]("n_low") == ratios.count(_ < 0.75).toLong)
    assert(row.getAs[Long]("n_high") == ratios.count(_ > 1.25).toLong)
    // JL concentration: the bulk must sit in the band
    assert(row.getAs[Long]("n_low") + row.getAs[Long]("n_high") <
      ratios.length / 2)
  }
}
