package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-71: tokenizer fertility and KL drift. */
class Extended71Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("tp27 fertility is the exact ratio of integer token totals") {
    val got = graft.queries.Extended71
      .queries("tp27_tokenizer_fertility")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toList
    assert(got.map(_._1) == got.map(_._1).sorted && got.nonEmpty)

    val docs = Tables.t(spark, d, "documents")
      .select(col("lang"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val byLang = docs.groupBy(_._1)
    got.foreach { case (lang, words, subs, fert) =>
      val texts = byLang(lang).map(_._2)
      val ws = texts.map(_.trim.split("\\s+").length.toLong).sum
      val bs = texts.map(_.trim.split("\\s+")
        .map(w => math.max(math.ceil(w.length / 4.0).toLong, 1L)).sum).sum
      assert((words, subs) == (ws, bs), lang)
      assert(fert == bs.toDouble / ws.toDouble, lang)
      assert(fert >= 1.0, s"fertility below 1 for $lang")
    }
  }

  test("a33 KL contributions match the local computation and are consistent") {
    val got = graft.queries.Extended71.queries("a33_kl_drift")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toList
    val docs = Tables.t(spark, d, "documents")
      .select(col("lang"),
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1) < "8")
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    val na = docs.count(_._2).toDouble
    val nb = docs.count(!_._2).toDouble
    got.foreach { case (lang, ca, cb, klab, klba) =>
      assert(ca == docs.count(p => p._1 == lang && p._2).toLong, lang)
      assert(cb == docs.count(p => p._1 == lang && !p._2).toLong, lang)
      // 1-ulp tolerance: JVM Math.log here differs from the engines' ln
      // in the last place on some inputs (Spark's catalyst ln and
      // DuckDB's ln agree with each other — the oracle pins that)
      val p = ca / na; val q = cb / nb
      assert(math.abs(klab - p * math.log(p / q)) < 1e-14, lang)
      assert(math.abs(klba - q * math.log(q / p)) < 1e-14, lang)
    }
    // Gibbs: summed KL in each direction is non-negative
    assert(got.map(_._4).sum >= -1e-12)
    assert(got.map(_._5).sum >= -1e-12)
  }
}
