package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.PrefixSum

/** Batch-62 operators: PrefixSum two-level scan, exact AUC, KS drift,
  * chi-square drift.
  */
class Extended62Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("PrefixSum equals the naive global window on seeded random histograms") {
    import spark.implicits._
    val rnd = new scala.util.Random(62)
    // values include negatives and gaps; counts positive longs
    val rows = (0 until 500).map(_ => rnd.nextInt(4000) - 2000)
      .distinct.map(v => (v.toLong, rnd.nextInt(50) + 1L, rnd.nextInt(9).toLong))
    val hist = rows.toDF("v", "n", "m")
    for (width <- Seq(1.0, 7.0, 64.0, 4096.0)) {
      val got = PrefixSum.cumSum(hist, "v", Seq("n", "m"), bucketWidth = width)
        .select("v", "cum_n", "pre_n", "cum_m", "pre_m")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).sortBy(_._1).toList
      val w = Window.orderBy("v")
      val want = hist.select(col("v"),
          sum("n").over(w).as("cn"), (sum("n").over(w) - col("n")).as("pn"),
          sum("m").over(w).as("cm"), (sum("m").over(w) - col("m")).as("pm"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).sortBy(_._1).toList
      assert(got == want, s"width=$width")
    }
  }

  test("PrefixSum grouped form equals per-group windows") {
    import spark.implicits._
    val rnd = new scala.util.Random(63)
    val rows = for {
      g <- Seq("x", "y", "z"); v <- 0 until 200 if rnd.nextBoolean()
    } yield (g, v.toLong, rnd.nextInt(20) + 1L)
    val hist = rows.toDF("g", "v", "n")
    val got = PrefixSum.cumSum(hist, "v", Seq("n"), groupCols = Seq("g"),
        bucketWidth = 16.0)
      .select("g", "v", "cum_n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toList
    val w = Window.partitionBy("g").orderBy("v")
    val want = hist.select(col("g"), col("v"), sum("n").over(w).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toList
    assert(got == want)
  }

  test("a27 AUC equals brute-force pair counting with half-credit ties") {
    val row = graft.queries.Extended62.queries("a27_auc")(spark, d).head()
    val (posN, negN, u2, auc) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3))

    // brute force over the same per-doc scores
    val sc = graft.queries.Extended62.classifierScores(spark, d)
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    val pos = sc.filter(_._2 == 1L).map(_._1)
    val neg = sc.filter(_._2 == 0L).map(_._1)
    assert(pos.length.toLong == posN && neg.length.toLong == negN)
    // 2·U = Σ over (p, n) pairs of (2 if p > n, 1 if tie, 0 otherwise)
    val u2Brute = (for (p <- pos; n <- neg) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    assert(u2 == u2Brute)
    assert(math.abs(auc - u2Brute.toDouble / (2.0 * pos.length * neg.length))
      < 1e-15)
  }

  test("a28 KS statistic equals the direct two-sample ECDF maximum") {
    val row = graft.queries.Extended62.queries("a28_ks_drift")(spark, d).head()
    val (nA, nB, dNum) = (row.getLong(0), row.getLong(1), row.getLong(2))

    val docs = Tables.t(spark, d, "documents")
      .select(col("doc_id"), col("n_chars"),
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1) < "8")
      .collect().map(r => (r.getLong(1), r.getBoolean(2)))
    val a = docs.filter(_._2).map(_._1).sorted
    val b = docs.filterNot(_._2).map(_._1).sorted
    assert(a.length.toLong == nA && b.length.toLong == nB)
    val values = (a ++ b).distinct.sorted
    val want = values.map { v =>
      val ca = a.count(_ <= v).toLong
      val cb = b.count(_ <= v).toLong
      math.abs(ca * b.length - cb * a.length)
    }.max
    assert(dNum == want)
  }

  test("a29 chi-square contributions match a local restatement") {
    val got = graft.queries.Extended62.queries("a29_chi2_drift")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toList

    val docs = Tables.t(spark, d, "documents")
      .select(col("lang"),
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1) < "8")
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    val ta = docs.count(_._2).toLong
    val tb = docs.count(!_._2).toLong
    val n = ta + tb
    for ((lang, oa, ob, ca, cb) <- got) {
      val wantOa = docs.count(p => p._1 == lang && p._2).toLong
      val wantOb = docs.count(p => p._1 == lang && !p._2).toLong
      assert(oa == wantOa && ob == wantOb, lang)
      val row = oa + ob
      def c(o: Long, colTot: Long): Double = {
        val num = o * n - row * colTot
        (num * num).toDouble / (n * row * colTot).toDouble
      }
      assert(ca == c(oa, ta) && cb == c(ob, tb), lang)
    }
    assert(got.map(_._1) == got.map(_._1).sorted)
  }
}
