package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.route.{Components, Route}

/** Batch-21 kernels: the distributed k-core peeling and the DataFrame
  * static-PageRank fixpoint against independent local recomputations, and
  * the e18 attribution query against a window-form restatement.
  */
class Extended21Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ---- local reference implementations ----

  private def localKCore(edges: Seq[(Long, Long)], k: Int): Set[Long] = {
    var adj = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var changed = true
    while (changed) {
      val bad = adj.collect { case (n, ns) if ns.size < k => n }.toSet
      changed = bad.nonEmpty
      adj = adj.collect { case (n, ns) if !bad(n) => n -> (ns -- bad) }
    }
    adj.keySet
  }

  private def localPr(nodes: Seq[Long], edges: Seq[(Long, Long)],
      iters: Int, reset: Double): Map[Long, Double] = {
    val outDeg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    var r = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Double]
        .withDefaultValue(0.0)
      for ((u, v) <- edges) contrib(v) += r(u) / outDeg(u)
      r = nodes.map(n => n -> (reset + (1 - reset) * contrib(n))).toMap
    }
    r
  }

  // ---- kCore ----

  test("kCore equals local peeling on a seeded random graph, several k") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val n = 60
    val edges = Seq.fill(200)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .distinct
    val df = edges.toDF("u", "v")
    for (k <- Seq(2, 3, 4, 6)) {
      val got = Components.kCore(spark, df, k)
        .collect().map(_.getLong(0)).toSet
      assert(got == localKCore(edges, k), s"k=$k")
    }
  }

  test("kCore: k above max degree yields the empty core") {
    import spark.implicits._
    val df = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("u", "v")
    assert(Components.kCore(spark, df, 3).isEmpty)
    assert(Components.kCore(spark, df, 2).count() == 3)
  }

  test("kCore ignores edge direction, parallel edges and self-loops") {
    import spark.implicits._
    // triangle written directed + duplicated + a self-loop: still a 2-core
    val df = Seq((1L, 2L), (2L, 1L), (2L, 3L), (2L, 3L), (3L, 1L), (1L, 1L))
      .toDF("u", "v")
    val got = Components.kCore(spark, df, 2).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L))
  }

  // ---- pageRankStatic ----

  test("pageRankStatic equals local power iteration (dangling + floor)") {
    import spark.implicits._
    // node 2 has no in-edges (floor at resetProb), node 5 no out-edges
    // (dangling mass dropped), node 3/4 have in-degree 2 (real sums)
    val nodes = Seq(1L, 2L, 3L, 4L, 5L)
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 4L), (4L, 1L), (2L, 4L), (4L, 5L))
    val got = Route.pageRankStatic(spark,
        nodes.toDF("node"), edges.toDF("src", "dst"), iters = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = localPr(nodes, edges, iters = 20, reset = 0.15)
    assert(got.keySet == want.keySet)
    for (n <- nodes)
      assert(math.abs(got(n) - want(n)) < 1e-12, s"node $n: ${got(n)} vs ${want(n)}")
    // the no-in-edge node sits exactly on the reset floor
    assert(got(2L) == 0.15)
  }

  test("pageRankStatic with zero iterations is the uniform start") {
    import spark.implicits._
    val got = Route.pageRankStatic(spark, Seq(7L).toDF("node"),
      Seq.empty[(Long, Long)].toDF("src", "dst"), iters = 0)
    assert(got.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((7L, 1.0)))
  }

  // ---- e18 attribution vs an independent window-form computation ----

  test("e18 attribution equals a join-argmax restatement on sf0.001") {
    val d = "/root/testdata/sf0.001"
    val got = graft.queries.Extended21.queries("e18_attribution")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))

    val ev = Tables.events(spark, d).withColumn("sec", unix_timestamp(col("ts")))
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("sec"))
    val touches = ev.filter(col("event_type").isin("click", "view"))
      .groupBy(col("user_id"), col("sec").as("t_sec"))
      .agg(max(struct(col("event_type"), col("event_id"))).as("m"))
      .select(col("user_id").as("t_user"), col("t_sec"),
        col("m.event_type").as("touch_type"), col("m.event_id").as("touch_id"))
    // plain theta-join + argmax over ALL prior touches (quadratic but
    // independent of the as-of operator's merge machinery)
    val want = conv
      .join(touches, col("user_id") === col("t_user") &&
        col("t_sec") <= col("sec"), "left")
      .groupBy(col("event_id"), col("sec"))
      .agg(max(struct(col("t_sec"), col("touch_type"), col("touch_id"))).as("b"))
      .select(col("event_id"),
        when(col("b.t_sec").isNotNull &&
          col("sec") - col("b.t_sec") <= 3L * 24 * 3600, col("b.touch_type"))
          .otherwise(lit("none")).as("channel"),
        when(col("b.t_sec").isNotNull &&
          col("sec") - col("b.t_sec") <= 3L * 24 * 3600, col("b.touch_id"))
          .as("touch_id"))
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))

    assert(got.nonEmpty && got.sameElements(want))
    assert(got.exists(_._2 == "none") || got.forall(_._2 != "none"))
  }
}
