package graft

import org.scalatest.funsuite.AnyFunSuite

/** Batch-80: PSI drift bins + Cohen's kappa, pinned to local brute force
  * over the collected classifier scores.
  */
class Extended80Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** Local restatement of the Extended62 classifier kernel: per doc with
    * ≥2 words, (inA coin, lang, score).
    */
  private lazy val scored: Seq[(Boolean, String, Double)] = {
    import org.apache.spark.sql.functions._
    graft.Tables.t(spark, d, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect().toSeq
      .flatMap { r =>
        val id = r.getLong(0)
        val words = r.getString(2).trim.split("\\s+")
        if (words.length < 2) None
        else {
          val grams = words.sliding(2).map(_.mkString(" ")).toSeq
          val siw = grams.map { g =>
            java.lang.Long.parseLong(md5hex(g).substring(0, 8), 16) %
              2001L - 1000L
          }.sum
          Some((md5hex(id.toString).charAt(0) < '8', r.getString(1),
            siw.toDouble / (grams.size * 1000L)))
        }
      }
  }

  test("a37 PSI terms match a local recomputation from per-doc scores") {
    val got = graft.queries.Extended80.queries("a37_psi_drift")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toList
    assert(got.nonEmpty && got.map(_._1) == got.map(_._1).sorted)

    val binned = scored.map { case (a, _, s0) =>
      (math.min(math.floor((s0 + 1.0) / 2.0 * 10.0), 9.0).toLong, a)
    }
    val nA = binned.count(_._2).toLong
    val nB = binned.size - nA
    val want = binned.groupBy(_._1).map { case (b, xs) =>
      (b, xs.count(_._2).toLong, (xs.size - xs.count(_._2)).toLong)
    }.filter { case (_, a, b) => a > 0 && b > 0 }.toSeq.sortBy(_._1)
    assert(got.map(_._1) == want.map(_._1))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.zip(want).foreach { case ((bin, na, nb, pa, pb, psi), (wb, wa, wbn)) =>
      assert(bin == wb && na == wa && nb == wbn, s"bin=$bin counts")
      val wpa = wa.toDouble / nA
      val wpb = wbn.toDouble / nB
      assert(pa == r6(wpa) && pb == r6(wpb), s"bin=$bin shares")
      assert(psi == r6((wpa - wpb) * math.log(wpa / wpb)), s"bin=$bin psi")
    }
  }

  test("tp32 kappa quadrants match brute force; single-division identity holds") {
    val row = graft.queries.Extended80.queries("tp32_cohens_kappa")(spark, d)
      .collect()
    assert(row.length == 1)
    val r = row(0)
    val (n, n11, n10, n01, n00) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n == n11 + n10 + n01 + n00)
    // quadrants against the local kernel
    assert(n == scored.size.toLong)
    assert(n11 == scored.count { case (_, l, s0) => l == "en" && s0 >= 0 }.toLong)
    assert(n10 == scored.count { case (_, l, s0) => l == "en" && s0 < 0 }.toLong)
    assert(n01 == scored.count { case (_, l, s0) => l != "en" && s0 >= 0 }.toLong)
    assert(n00 == scored.count { case (_, l, s0) => l != "en" && s0 < 0 }.toLong)
    val s0 = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    assert(r.getLong(5) == n * (n11 + n00) - s0)
    assert(r.getLong(6) == n * n - s0)
    val want = BigDecimal(r.getLong(5).toDouble / r.getLong(6).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(7) == want)
    // kappa must equal the textbook (po−pe)/(1−pe) up to the 6-decimal
    // output rounding (max 5e-7)
    val po = (n11 + n00).toDouble / n
    val pe = s0.toDouble / (n.toDouble * n)
    assert(math.abs(r.getDouble(7) - (po - pe) / (1 - pe)) < 1e-6)
  }
}
