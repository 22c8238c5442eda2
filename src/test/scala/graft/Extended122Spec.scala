package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-122: max_len planning sweep and language trigram distances,
  * pinned to local replays.
  */
class Extended122Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("tp41 sweep matches local truncation/padding accounting") {
    val got = graft.queries.Extended122.queries("tp41_maxlen_sweep")(spark, d)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getDouble(6))).toMap
    val nws = Tables.t(spark, d, "documents")
      .select(col("text")).collect()
      .map(r => r.getString(0).split(" ", -1).length.toLong)
    Seq(128L, 256L, 512L, 1024L).foreach { l =>
      val kept = nws.map(n => math.min(n, l)).sum
      val lost = nws.map(n => math.max(n - l, 0L)).sum
      val g = got(l)
      assert(g._1 == nws.length.toLong)
      assert(g._2 == nws.sum, s"L=$l total")
      assert(g._3 == kept, s"L=$l kept")
      assert(g._4 == lost, s"L=$l lost")
      assert(g._5 == nws.length * l - kept, s"L=$l padding")
      assert(math.abs(g._6 - kept.toDouble / (nws.length * l)) < 1e-6)
      // conservation: every original token is either kept or truncated
      assert(g._3 + g._4 == g._2, s"L=$l conservation")
    }
    // monotone tradeoff: kept and padding rise with L, loss falls
    assert(got(128L)._4 >= got(1024L)._4)
    assert(got(128L)._5 <= got(1024L)._5)
    assert(got(128L)._6 >= got(1024L)._6, "small L utilizes better here")
  }

  test("t37 cosines match a local trigram-profile computation") {
    val got = graft.queries.Extended122
      .queries("t37_lang_trigram_distance")(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    val docs = Tables.t(spark, d, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val profiles = docs.groupBy(_._1).map { case (lang, ds) =>
      lang -> ds.flatMap { case (_, text) =>
        if (text.length < 3) Seq.empty
        else (0 to text.length - 3).map(i => text.substring(i, i + 3))
      }.groupBy(identity).map { case (g, o) => g -> o.size.toLong }
    }
    val langs = profiles.keys.toSeq.sorted
    for { a <- langs; b <- langs if a < b } {
      val pa = profiles(a); val pb = profiles(b)
      val dot = pa.map { case (g, c) =>
        BigInt(c) * BigInt(pb.getOrElse(g, 0L)) }.sum
      val na = pa.values.map(c => BigInt(c) * c).sum
      val nb = pb.values.map(c => BigInt(c) * c).sum
      val want = dot.toDouble / math.sqrt((na * nb).toDouble)
      assert(math.abs(got((a, b)) - want) < 1e-6, s"$a/$b")
      assert(got((a, b)) > 0.0 && got((a, b)) <= 1.0 + 1e-9)
    }
    assert(got.size == langs.size * (langs.size - 1) / 2)
  }
}
