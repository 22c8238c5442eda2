package graft

import org.scalatest.funsuite.AnyFunSuite

/** Batch-78: calibration bins + dedup threshold retention curve. */
class Extended78Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("tp30 bins partition the scored corpus and rates/gaps are exact") {
    val got = graft.queries.Extended78.queries("tp30_calibration_bins")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toList
    assert(got.map(_._1) == got.map(_._1).sorted)
    assert(got.forall { case (b, _, _, _, _, _) => b >= 0 && b <= 9 })

    val scored = graft.queries.Extended62.classifierScores(spark, d)
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    assert(got.map(_._2).sum == scored.length.toLong)
    val byBin = scored.groupBy { case (s0, _) =>
      math.min(math.floor((s0 + 1.0) / 2.0 * 10.0), 9.0).toLong
    }
    got.foreach { case (b, n, nPos, mid, obs, gap) =>
      val rows = byBin(b)
      assert(n == rows.length.toLong && nPos == rows.count(_._2 == 1L).toLong,
        s"bin=$b")
      assert(mid == (2 * b + 1).toDouble / 20.0)
      val wantObs = BigDecimal(nPos.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(obs == wantObs, s"bin=$b")
      assert(gap >= 0.0 && gap <= 1.0)
    }
  }

  test("tp31 pair counts are non-increasing and retention non-decreasing in the threshold") {
    val got = graft.queries.Extended78.queries("tp31_dedup_threshold_curve")(spark, d)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toList
    assert(got.size == 5 && got.map(_._1) == List(0.5, 0.6, 0.7, 0.8, 0.9))
    val pairsDesc = got.map(_._2)
    assert(pairsDesc == pairsDesc.sorted.reverse, s"n_pairs not monotone: $pairsDesc")
    val retention = got.map(_._4)
    assert(retention == retention.sorted, s"retention not monotone: $retention")

    // brute-force the curve from the verified LSH pair set itself
    val verified = graft.llm.Dedup.minhashNearDups(
        spark.read.parquet(s"$d/documents.parquet"), "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nDocs = spark.read.parquet(s"$d/documents.parquet").count()
    got.foreach { case (t, nPairs, nRemoved, ret) =>
      val q = verified.filter(_._3 >= t)
      assert(nPairs == q.length.toLong, s"t=$t")
      assert(nRemoved == q.map(_._2).distinct.length.toLong, s"t=$t")
      val wantRet = BigDecimal((nDocs - nRemoved).toDouble / nDocs)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(ret == wantRet, s"t=$t")
    }
  }
}
