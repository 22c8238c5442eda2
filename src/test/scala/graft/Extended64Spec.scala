package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-64 operators: MaxSim late interaction and curriculum ordering. */
class Extended64Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("v8 MaxSim equals a local brute-force late-interaction model") {
    val got = graft.queries.Extended64.queries("v8_maxsim")(spark, d)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList

    val vecs = Tables.t(spark, d, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val q = vecs.find(_._1 == 0L).get._2
    def sub(v: Array[Double], i: Int) = v.slice(8 * i, 8 * i + 8)
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
    val want = vecs.filter(_._1 != 0L).map { case (id, v) =>
      // identical left-assoc 8-term sum as the query
      val ms = (0 until 8).map { qi =>
        (0 until 8).map(di => dot(sub(v, di), sub(q, qi))).max
      }
      (id, ms.foldLeft(0.0)(_ + _))
    }.sortBy(t => (-t._2, t._1)).take(10).toList
    assert(got.map(_._1) == want.map(_._1))
    got.zip(want).foreach { case ((_, g), (_, w)) =>
      assert(math.abs(g - w) < 1e-12)
    }
  }

  test("tp24 assigns a contiguous global permutation honoring stage order") {
    val got = graft.queries.Extended64.queries("tp24_curriculum_order")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val n = got.size
    assert(got.map(_._3).sorted == (1L to n.toLong).toList)
    // ranks are stage-monotone: every stage-s rank precedes every stage-(s+1)
    val byRank = got.sortBy(_._3)
    assert(byRank.map(_._2) == byRank.map(_._2).sorted)
    // within a stage, order is the md5 shuffle
    val docs = Tables.t(spark, d, "documents")
      .select(col("doc_id"),
        md5(col("doc_id").cast("string").cast("binary")).as("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    byRank.groupBy(_._2).foreach { case (_, rows) =>
      val inStage = rows.sortBy(_._3).map(_._1)
      assert(inStage == inStage.sortBy(id => (docs(id), id)))
    }
  }

  test("tp24 matches the oracle's single global sort restatement") {
    val got = graft.queries.Extended64.queries("tp24_curriculum_order")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toList
    val want = Tables.t(spark, d, "documents")
      .select(col("doc_id"), floor(col("n_chars") / 64L).cast("long").as("st"),
        md5(col("doc_id").cast("string").cast("binary")).as("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._2, t._3, t._1))
      .zipWithIndex.map { case ((id, _, _), i) => (id, i + 1L) }.toList
    assert(got.sortBy(_._2) == want)
  }
}
