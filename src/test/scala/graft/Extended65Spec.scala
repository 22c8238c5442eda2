package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.llm.Coreset

/** Batch-65 operators: greedy k-center coreset and n-gram novelty. */
class Extended65Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    def dot(x: Array[Double], y: Array[Double]) =
      x.zip(y).foldLeft(0.0) { case (s, (p, q)) => s + p * q }
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  }

  test("kCenterGreedy equals the local greedy model on the corpus") {
    val got = graft.queries.Extended65.queries("tp25_kcenter_coreset")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList

    val vecs = Tables.t(spark, d, "embeddings").filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    var centers = Vector(1L)
    var md = vecs.map { case (id, v) =>
      id -> (1.0 - cos(v, vecs.find(_._1 == 1L).get._2))
    }.toMap
    for (_ <- 2 to 5) {
      val next = vecs.map(_._1).minBy(id => (-md(id), id))
      centers :+= next
      val nv = vecs.find(_._1 == next).get._2
      md = vecs.map { case (id, v) =>
        id -> math.min(md(id), 1.0 - cos(v, nv))
      }.toMap
    }
    assert(got == centers.zipWithIndex.map { case (id, i) => (i + 1L, id) })
  }

  test("coreset centers are spread: pairwise distance >= covering radius") {
    // Gonzalez invariant: min pairwise center distance >= max_x min_c d(x,c)
    val ids = graft.queries.Extended65.queries("tp25_kcenter_coreset")(spark, d)
      .collect().map(_.getLong(1)).toSet
    val vecs = Tables.t(spark, d, "embeddings").filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val cs = vecs.filter(v => ids.contains(v._1))
    val pairMin = (for (a <- cs; b <- cs if a._1 < b._1)
      yield 1.0 - cos(a._2, b._2)).min
    val radius = vecs.map { case (_, v) =>
      cs.map(c => 1.0 - cos(v, c._2)).min
    }.max
    assert(pairMin >= radius - 1e-12)
  }

  test("t24 novelty: first doc is fully novel, totals match tp13's gram count") {
    val got = graft.queries.Extended65.queries("t24_ngram_novelty")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toList
    val first = got.minBy(_._1)
    assert(first._3 == first._2 && first._4 == 1.0)
    got.foreach { case (id, tot, nov, frac) =>
      assert(nov <= tot && frac == nov.toDouble / tot, s"doc $id")
    }
    // totals agree with the tp13 pipeline's per-doc 5-gram discipline
    // restated locally at n=3
    val docs = Tables.t(spark, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList))
    val grams = docs.flatMap { case (id, ws) =>
      if (ws.size < 3) Nil
      else ws.sliding(3).map(g => (id, g.mkString(" "))).toList
    }
    val fd = grams.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val wantByDoc = grams.groupBy(_._1).view.mapValues { gs =>
      (gs.size.toLong, gs.count { case (id, g) => fd(g) == id }.toLong)
    }.toMap
    got.foreach { case (id, tot, nov, _) =>
      assert((tot, nov) == wantByDoc(id), s"doc $id")
    }
  }
}
