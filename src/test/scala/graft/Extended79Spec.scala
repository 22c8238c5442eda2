package graft

import org.scalatest.funsuite.AnyFunSuite

/** Batch-79: MinHash calibration + audio DSP. */
class Extended79Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("t27 calibration deciles are consistent and bounded") {
    val got = graft.queries.Extended79.queries("t27_minhash_calibration")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toList
    assert(got.nonEmpty && got.map(_._1) == got.map(_._1).sorted)
    got.foreach { case (dec, n, meanEst, over, under, mae) =>
      assert(dec >= 0 && dec <= 9)
      assert(n > 0 && over + under <= n, s"decile=$dec")
      assert(meanEst >= 0.0 && meanEst <= 1.0, s"decile=$dec")
      assert(mae >= 0.0 && mae <= 1.0, s"decile=$dec")
    }
    // total pairs equals the LSH candidate-pair count
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val buckets = graft.llm.Dedup.lshBuckets(docs, "doc_id", "text")
    val nCand = buckets.toDF("a", "band", "bucket")
      .join(buckets.toDF("b", "band", "bucket"), Seq("band", "bucket"))
      .filter(org.apache.spark.sql.functions.col("a") <
        org.apache.spark.sql.functions.col("b"))
      .select("a", "b").distinct().count()
    assert(got.map(_._2).sum == nCand)
  }

  test("mm6 DSP stats equal the generation stream recomputed locally") {
    val got = graft.queries.Extended79.queries("mm6_audio_dsp")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7),
        r.getDouble(8)))
    assert(got.nonEmpty)
    got.foreach { case (id, rate, ch, frames, zc, peak, silent, zcr, sr) =>
      assert(rate == graft.llm.Multimodal.synthRate(id))
      assert(ch == graft.llm.Multimodal.synthAudioChannels(id))
      assert(frames == graft.llm.Multimodal.synthFrames(id).toLong)
      val n = frames.toInt * ch
      val vals = (0 until n).map(i => graft.llm.Multimodal.synthSample(id, i))
      val c0 = vals.indices.filter(_ % ch == 0).map(vals)
      val wantZc = c0.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)).toLong
      val wantPeak = vals.map(v => math.abs(v.toLong)).max
      val wantSilent = vals.count(v => math.abs(v) < 1024).toLong
      assert(zc == wantZc, s"id=$id zc")
      assert(peak == wantPeak, s"id=$id peak")
      assert(silent == wantSilent, s"id=$id silent")
      assert(zcr == BigDecimal(wantZc.toDouble / (frames - 1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"id=$id zcr")
      assert(sr == BigDecimal(wantSilent.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"id=$id sr")
    }
  }
}
