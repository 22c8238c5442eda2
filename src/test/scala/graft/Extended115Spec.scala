package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-115: DBSCAN census and the LSH width curve, pinned to local
  * brute-force replays.
  */
class Extended115Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("g13 census matches a local brute-force eps-neighborhood walk") {
    val row = graft.queries.Extended115.queries("g13_dbscan_core")(spark, d)
      .collect().head
    val pts = Tables.t(spark, d, "events")
      .select(col("event_id"), round(col("value") * 100).cast("long"),
        col("user_id") * 400L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val eps2 = 500L * 500L
    // brute-force O(n²) is affordable at this sf and is the point: the
    // engine's ring join must agree with the unbucketed definition
    val counts = pts.map { a =>
      a._1 -> pts.count(b =>
        (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3) <= eps2)
    }.toMap
    val core = counts.filter(_._2 >= 4).keySet
    val ptById = pts.map(p => p._1 -> p).toMap
    val border = pts.filter(p => !core.contains(p._1)).count { p =>
      core.exists { cid =>
        val c = ptById(cid)
        (p._2 - c._2) * (p._2 - c._2) + (p._3 - c._3) * (p._3 - c._3) <= eps2
      }
    }
    assert(row.getLong(2) == pts.length.toLong, "n_points")
    assert(row.getLong(3) == core.size.toLong, "n_core")
    assert(row.getLong(4) == border.toLong, "n_border")
    assert(row.getLong(5) == pts.length.toLong - core.size - border, "n_noise")
    // the census must be a real partition with at least two classes
    assert(Seq(row.getLong(3), row.getLong(4), row.getLong(5))
      .count(_ > 0L) >= 2)
  }

  test("dbscanCensus ring-candidate budget guard fails loudly when the " +
      "eps/density parameterization would blow up the ring join") {
    import spark.implicits._
    // 100 points in ONE cell → 100·100 ring candidates through the 3×3
    // ring — a budget below that must refuse before paying the join
    val pts = (0L until 100L).map(i => (i, i % 10, i / 10)).toDF("id", "x", "y")
    val cand = graft.spatial.Spatial.ringCandidateCount(pts, "x", "y", 500L)
    assert(cand == 100L * 100L)
    val e = intercept[IllegalArgumentException] {
      graft.spatial.Spatial.dbscanCensus(pts, "id", "x", "y", 500L, 4L,
        maxRingCandidates = 9999L)
    }
    assert(e.getMessage.contains("ring-candidate"))
    // and the same census under an adequate budget still runs
    val ok = graft.spatial.Spatial.dbscanCensus(pts, "id", "x", "y", 500L, 4L)
      .collect().head
    assert(ok.getLong(2) == 100L && ok.getLong(3) == 100L)
  }

  test("v17 recall curve is prefix-consistent and matches brute membership") {
    val got = graft.queries.Extended115
      .queries("v17_lsh_recall_curve")(spark, d)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // candidate sets shrink (or hold) as bits grow — the prefix property
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 >= b._2, s"candidates must shrink ${a._1}->${b._1}")
        assert(a._3 >= b._3, s"hits must shrink ${a._1}->${b._1}")
      case _ =>
    }
    got.foreach { case (bits, nc, hits, recall) =>
      assert(hits <= 10 && hits <= nc, s"$bits-bit sanity")
      assert(math.abs(recall - hits / 10.0) < 1e-9, s"$bits-bit recall")
    }
    // exact replay: recompute every signature from the shared plane rows
    // and count bucket-mates per width (bucket size is the load-bearing
    // number; on this near-random corpus recall may legitimately be low)
    val vecs = Tables.t(spark, d, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val planes = graft.llm.Similarity.planeRows(64, 16)
    def sig(v: Array[Double]): Long = planes.map { case (b, w) =>
      val dot = (0 until 64).map(i => v(i) * w(i)).sum
      if (dot >= 0) 1L << b else 0L
    }.sum
    val sigs = vecs.map { case (id, v) => id -> sig(v) }.toMap
    val qsig = sigs(0L)
    val gotByBits = got.map(g => g._1 -> g._2).toMap
    Seq(4, 8, 12, 16).foreach { bits =>
      val mask = (1L << bits) - 1
      val want = vecs.count { case (id, _) =>
        id != 0L && (sigs(id) & mask) == (qsig & mask) }
      gotByBits.get(bits).foreach(nc =>
        assert(nc == want.toLong, s"$bits-bit bucket size"))
      if (!gotByBits.contains(bits)) assert(want == 0, s"$bits-bit missing")
    }
    assert(got.nonEmpty && got.head._1 == 4)
  }
}
