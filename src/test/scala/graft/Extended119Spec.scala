package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-119: windowed audio energy and Burrows' Delta, pinned to
  * generation-stream / textbook replays.
  */
class Extended119Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("mm10 windows match the splitmix sample stream exactly") {
    val got = graft.queries.Extended119.queries("mm10_audio_energy")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap

    def sample(id: Long, i: Long): Long =
      java.lang.Math.floorMod(
        graft.functions.Hashing.splitmix64(id * 999983L + i), 65536L) - 32768L
    val ids = Tables.t(spark, d, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0))
    var checked = 0
    ids.foreach { id =>
      val n = 40 + (id % 30).toInt
      val ch = 1 + ((id / 3) % 2).toInt
      (0 until (n + 15) / 16).foreach { w =>
        val lo = w * 16
        val hi = math.min(lo + 16, n)
        val ss = (lo until hi).map(f => sample(id, f.toLong * ch))
        val sumSq = ss.map(s => s * s).sum
        val peak = ss.map(math.abs).max
        val g = got((id, w))
        assert(g._1 == (hi - lo).toLong, s"$id/$w n")
        assert(g._2 == sumSq, s"$id/$w sum_sq")
        assert(g._3 == peak, s"$id/$w peak")
        assert(math.abs(g._4 - math.sqrt(sumSq.toDouble / (hi - lo))) < 1e-4)
        checked += 1
      }
    }
    assert(checked == got.size, "no extra windows")
    assert(checked > ids.length * 2, "multiple windows per clip")
  }

  test("t36 deltas match a local textbook Burrows computation") {
    val got = graft.queries.Extended119.queries("t36_burrows_delta")(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap

    val docs = Tables.t(spark, d, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val toks = docs.flatMap { case (src, text) =>
      text.split(" ", -1).filter(_.nonEmpty).map(src -> _) }
    val srcTot = toks.groupBy(_._1).map { case (s, v) => s -> v.size.toLong }
    val top = toks.map(_._2).groupBy(identity)
      .map { case (w, v) => w -> v.size }
      .toSeq.sortBy { case (w, c) => (-c, w) }.take(30).map(_._1)
    val sources = srcTot.keys.toSeq.sorted
    val f = (for { s <- sources; w <- top } yield {
      val c = toks.count(t => t._1 == s && t._2 == w).toLong
      (s, w) -> c.toDouble / srcTot(s)
    }).toMap
    val k = sources.size
    val usable = top.flatMap { w =>
      val fs = sources.map(s => f((s, w)))
      val mu = fs.sum / k
      val sigma = math.sqrt(fs.map(x => x * x).sum / k - mu * mu)
      if (sigma > 0) Some(w -> (mu, sigma)) else None
    }.toMap
    for {
      a <- sources; b <- sources if a < b
    } {
      val dzs = usable.toSeq.map { case (w, (mu, sigma)) =>
        math.abs((f((a, w)) - mu) / sigma - (f((b, w)) - mu) / sigma) }
      val want = dzs.sum / dzs.size
      val g = got((a, b))
      assert(g._1 == usable.size.toLong, s"$a/$b n_words")
      assert(math.abs(g._2 - want) < 1e-5, s"$a/$b delta ${g._2} vs $want")
    }
    assert(got.size == k * (k - 1) / 2)
    // delta is a real metric: symmetric-by-construction pairs, nonnegative
    assert(got.values.forall(_._2 >= 0.0))
  }
}
