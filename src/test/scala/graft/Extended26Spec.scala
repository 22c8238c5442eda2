package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.llm.Similarity
import graft.route.Components

/** Batch-26 operators against independent local recomputations. */
class Extended26Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  // deterministic near-orthogonal corpus: one-hot(i) in 40 dims plus a
  // small bleed into dim (i+1) mod 40 (max cross-pair cosine ≈ 0.099,
  // far below the 0.999 threshold), with three EXACT duplicate pairs
  // planted at (j, 100 + j) — identical vectors always co-cluster.
  private def plantedEmbeddings() = {
    import spark.implicits._
    val base = (0L until 40L).map { i =>
      val v = Array.fill(40)(0.0f)
      v(i.toInt) = 1.0f
      v(((i + 1) % 40).toInt) = 0.1f
      (i, v.toSeq)
    }
    val dups = (0L until 3L).map(j => (100L + j, base(j.toInt)._2))
    (base ++ dups).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("semDedup drops exactly the planted duplicates, keeps the low id") {
    val emb = plantedEmbeddings()
    val kept = Similarity.semDedup(emb, "vec_id", "embedding",
      threshold = 0.999, nCentroids = 4, trainIters = 2)
      .collect().map(_.getLong(0)).toSet
    assert(!kept.exists(id => id >= 100L)) // every duplicate copy dropped
    assert((0L until 40L).forall(kept))    // every original kept
  }

  test("semDedup at an unreachable threshold keeps everything, with cids") {
    val emb = plantedEmbeddings()
    val rows = Similarity.semDedup(emb, "vec_id", "embedding",
      threshold = 1.01, nCentroids = 4, trainIters = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.length == 43)
    assert(rows.forall { case (_, cid) => cid >= 0 && cid < 4 })
  }

  test("semDedup only prunes within clusters (documented SemDeDup trade-off)") {
    import spark.implicits._
    // two identical vectors forced into DIFFERENT clusters by seeding
    // nCentroids = corpus size with 0 training iterations: assignment is
    // nearest-of-all-seeds, and each vector IS a seed, so the first-max
    // tie-break sends the twin pair to the lower seed's cluster — both
    // land in cluster of vec 0, hence the dup IS caught. Contrast: with
    // an orthogonal corpus and per-vector clusters, nothing is dropped.
    val twins = Seq((0L, Seq(1f, 0f)), (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val kept = Similarity.semDedup(twins, "vec_id", "embedding",
      threshold = 0.999, nCentroids = 3, trainIters = 0)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 2L)) // twin 1 co-clusters with its seed twin 0
  }

  // local synchronous-LPA reference: identical vote/tie rule, plain fold
  private def lpaLocal(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val sym = edges.filter(e => e._1 != e._2).flatMap(e => Seq(e, e.swap)).distinct
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels: Map[Long, Long] = adj.keys.map(k => k -> k).toMap
    var it = 0
    while (it < rounds) {
      labels = adj.map { case (n, nbrs) =>
        val votes = nbrs.groupBy(labels).view.mapValues(_.size.toLong)
        n -> votes.toSeq.map { case (l, c) => (-c, l) }.min._2
      }
      it += 1
    }
    labels
  }

  test("labelPropagation converges each disconnected triangle to its min id") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("a", "b")
    val got = Components.labelPropagation(spark, edges, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("labelPropagation rounds=0 returns the identity labeling") {
    import spark.implicits._
    val edges = Seq((5L, 6L), (6L, 7L)).toDF("a", "b")
    val got = Components.labelPropagation(spark, edges, rounds = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(5L -> 5L, 6L -> 6L, 7L -> 7L))
  }

  test("labelPropagation matches the local reference on a seeded random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val n = 40L
    val edges = (0 until 120).map(_ =>
      (rnd.nextLong(n), rnd.nextLong(n))).filter(e => e._1 != e._2).distinct
    for (rounds <- Seq(1, 3)) {
      val got = Components.labelPropagation(spark, edges.toDF("a", "b"), rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == lpaLocal(edges, rounds), s"rounds=$rounds")
    }
  }

  test("st6 streaming sliding replay equals the batch sliding aggregate") {
    val got = graft.queries.Extended26.queries("st6_stream_sliding")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    val want = Tables.events(spark, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("total"))
      .orderBy("win_start", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.nonEmpty && got.sameElements(want))
  }

  test("q11 bi-nation volume is non-empty, bounded, and never self-paired") {
    val rows = graft.queries.Extended26.queries("q11_nation_volume")(spark, d)
      .collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(r => r.getString(0) != r.getString(1)))
    assert(rows.forall(r => r.getInt(2) == 1997 || r.getInt(2) == 1998))
  }
}
