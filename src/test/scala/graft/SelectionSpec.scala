package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Selection

/** Two-level histogram selection (operators/Selection): the distributed
  * and bounded-collect paths must agree with each other and with the
  * naive windowed selection on randomized histograms, and the executed
  * plans of the rewired exact-median queries must carry no Window node
  * at all (the r6 weak-watch: per-group single-reducer cumulative
  * windows over the full value domain).
  */
class SelectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Naive oracle: full cumulative selection, computed locally. */
  private def naive(rows: Seq[(String, Long, Long)],
      target: Long => Long): Map[String, Long] =
    rows.groupBy(_._1).map { case (g, rs) =>
      val hist = rs.groupBy(_._2).map { case (v, xs) => (v, xs.map(_._3).sum) }
        .toSeq.sortBy(_._1)
      val tw = hist.map(_._2).sum
      val rank = target(tw)
      var cum = 0L
      val v = hist.find { case (_, n) => cum += n; cum >= rank }
        .getOrElse(hist.last)._1
      g -> v
    }

  private def randomHist(seed: Long, spread: Long): Seq[(String, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    val groups = Seq("A", "B", "C")
    (0 until 400).map { _ =>
      val g = groups(rnd.nextInt(groups.length))
      val v = (rnd.nextLong() % spread).abs - spread / 3 // negatives too
      (g, v, 1L + rnd.nextInt(5).toLong)
    }
  }

  test("distributed and bounded paths match the naive selection on random histograms") {
    for (seed <- 1 to 12; spread <- Seq(100L, 100000L, 50000000L)) {
      val rows = randomHist(seed, spread)
      val df = rows.toDF("g", "v", "n")
      val expect = naive(rows, tw => (tw + 1) / 2)
      val dist = Selection.lowerMedian(df, Seq("g"), "v", "n", "med")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val bounded = Selection.lowerMedianBounded(df, Seq("g"), "v", "n", "med")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(dist == expect, s"distributed path diverged (seed=$seed spread=$spread)")
      assert(bounded == expect, s"bounded path diverged (seed=$seed spread=$spread)")
    }
  }

  test("bounded path handles duplicate value keys (unaggregated input)") {
    val rows = Seq(("A", 5L, 2L), ("A", 5L, 3L), ("A", 1L, 1L), ("A", 9L, 1L),
      ("B", 2L, 1L), ("B", 2L, 1L))
    val df = rows.toDF("g", "v", "n")
    val expect = naive(rows, tw => (tw + 1) / 2)
    val got = Selection.lowerMedianBounded(df, Seq("g"), "v", "n", "med")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("double-typed values select exactly (grouped, fractional weights domain)") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map { _ =>
      ("G" + rnd.nextInt(2), math.rint(rnd.nextDouble() * 1e6) / 100.0,
        1L + rnd.nextInt(3).toLong)
    }
    val df = rows.toDF("g", "v", "n")
    // local oracle on doubles
    val expect = rows.groupBy(_._1).map { case (g, rs) =>
      val hist = rs.groupBy(_._2).map { case (v, xs) => (v, xs.map(_._3).sum) }
        .toSeq.sortBy(_._1)
      val tw = hist.map(_._2).sum
      var cum = 0L
      g -> hist.find { case (_, n) => cum += n; 2 * cum >= tw }.get._1
    }
    val got = Selection.lowerMedianBounded(df, Seq("g"), "v", "n", "med",
        bucketWidth = 1024.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == expect)
  }

  test("ungrouped multi-target selection matches per-quantile naive ranks") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 500).map(_ => ("x", rnd.nextInt(100000).toLong, 1L))
    val df = rows.map { case (_, v, n) => (v, n) }.toDF("v", "n")
    val qs = Seq(0.5, 0.9, 0.99)
    val got = Selection.selectRanksBounded(df, Seq.empty, "v", "n",
        qs.map(q => (q.toString, (tw: Long) => math.ceil(q * tw).toLong)),
        "q", "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    qs.foreach { q =>
      val expect = naive(rows, tw => math.ceil(q * tw).toLong)("x")
      assert(got(q.toString) == expect, s"q=$q")
    }
  }

  test("null values carry no rank in either path") {
    val rows: Seq[(String, java.lang.Long, Long)] = Seq(
      ("A", 1L, 1L), ("A", null, 100L), ("A", 3L, 1L), ("A", 5L, 1L),
      ("B", null, 5L), ("B", 2L, 1L))
    val df = rows.toDF("g", "v", "n")
    val expect = Map("A" -> 3L, "B" -> 2L)
    val dist = Selection.lowerMedian(df, Seq("g"), "v", "n", "med")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bounded = Selection.lowerMedianBounded(df, Seq("g"), "v", "n", "med")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dist == expect && bounded == expect)
  }

  test("sketch med+mad matches naive double selection on random histograms") {
    for (seed <- 1 to 8; spread <- Seq(100L, 100000L, 50000000L)) {
      val rows = randomHist(seed, spread)
      val df = rows.toDF("g", "v", "n")
      val expMed = naive(rows, tw => (tw + 1) / 2)
      // naive MAD: re-key the histogram by |v - med|, select again
      val expMad = rows.groupBy(_._1).map { case (g, rs) =>
        val med = expMed(g)
        val dv = rs.map { case (_, v, n) => (g, math.abs(v - med), n) }
        g -> naive(dv, tw => (tw + 1) / 2)(g)
      }
      val got = Selection.medianMadBounded(df, Seq("g"), "v", "n", "med", "mad")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got.keySet == expMed.keySet, s"groups diverged (seed=$seed)")
      got.foreach { case (g, (med, mad)) =>
        assert(med == expMed(g), s"median diverged g=$g seed=$seed spread=$spread")
        assert(mad == expMad(g), s"mad diverged g=$g seed=$seed spread=$spread")
      }
    }
  }

  test("sketch med+mad folds duplicate raw rows and multi-column groups") {
    val rows = Seq(("A", "x", 5L), ("A", "x", 5L), ("A", "x", 1L),
      ("A", "y", 9L), ("A", "y", 9L), ("B", "x", 2L))
    val df = rows.toDF("g1", "g2", "v").withColumn("n", lit(1L))
    val got = Selection.medianMadBounded(df, Seq("g1", "g2"), "v", "n",
        "med", "mad")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // (A,x): values 5,5,1 -> med 5, deviations 0,0,4 -> mad 0
    // (A,y): 9,9 -> med 9, mad 0;  (B,x): 2 -> med 2, mad 0
    assert(got == Map(("A", "x") -> ((5L, 0L)), ("A", "y") -> ((9L, 0L)),
      ("B", "x") -> ((2L, 0L))))
  }

  test("sketch med+mad guards unbounded domains loudly") {
    val df = spark.range(0, 5000).selectExpr("'g' AS g", "id AS v", "1L AS n")
    val e = intercept[org.apache.spark.SparkException] {
      Selection.medianMadBounded(df, Seq("g"), "v", "n", "med", "mad",
        maxCollect = 1000)
    }
    assert(e.getMessage.contains("selectRank") ||
      Option(e.getCause).exists(_.getMessage.contains("selectRank")))
  }

  test("rewired exact-median plans carry no Window node") {
    val sf = "/root/testdata/sf0.001"
    for (name <- Seq("a19_exact_median_hist", "a20_weighted_median",
        "a22_mad", "e27_robust_outliers")) {
      val df = SparkEntry.queries(name)(spark, sf)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Window"),
        s"$name still runs a cumulative window:\n$p")
    }
  }
}
