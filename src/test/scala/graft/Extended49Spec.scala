package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-49 operators against hand-computed fixtures. */
class Extended49Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("rich club: phi is monotone-reported for the sf0.001 graph and exact at k=0") {
    val d = "/root/testdata/sf0.001"
    val out = graft.queries.Extended49.queries("j23_rich_club")(spark, d)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    // k=0 is global density: 2E/(N(N-1)) over all nodes with degree > 0
    val (k0, n0, e0, phi0) = out.head
    assert(k0 == 0)
    val expected = BigDecimal(2.0 * e0 / (n0 * (n0 - 1.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(phi0 == expected)
    // node counts shrink as k rises (where more than one row is reported)
    assert(out.map(_._2).toSeq.sliding(2).filter(_.length == 2)
      .forall(w => w(1) < w(0)))
  }

  test("flesch readability on a hand fixture") {
    import spark.implicits._
    // "the cat sat. it sat!" -> words=5 (split on space), sentences=2,
    // vowel groups in lowercase: e,a,a,i,a = 5
    // flesch = 206.835 - 1.015*(5/2) - 84.6*(5/5) = 206.835-2.5375-84.6
    val docs = Seq((0L, "the cat sat. it sat!", "en", "s", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("e49spec").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.queries.Extended49.queries("t21_readability")(spark, tmp)
      .collect().head
    assert(out.getLong(1) == 5L)
    assert(out.getLong(2) == 2L)
    assert(out.getLong(3) == 5L)
    assert(out.getDouble(4) == 119.6975)
  }
}
