package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

/** Property test for the j9 triangle kernel (degree-oriented edge-centric
  * adjacency intersection): random undirected graphs against the O(n³)
  * definitional count. The oracle gates j9 on one graph family only (the
  * co-order part graph); this pins the kernel on arbitrary topologies —
  * hubs, cliques, forests, isolated edges.
  */
class TrianglePropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def forSeeds[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      val a = gen(Gen.Parameters.default, Seed(0x7A1A96L + i * 9311L))
        .getOrElse(fail(s"generator failed at seed $i"))
      body(a)
    }

  private val graphGen: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.chooseNum(3, 14)
    dense <- Gen.chooseNum(15, 80)
    picks <- Gen.listOfN(n * (n - 1) / 2, Gen.chooseNum(0, 99))
  } yield {
    val all = for (i <- 0 until n; j <- (i + 1) until n) yield (i.toLong, j.toLong)
    all.zip(picks).filter(_._2 < dense).map(_._1)
  }

  /** The same kernel as j9_triangles, applied to an arbitrary edge list. */
  private def kernel(edges: Seq[(Long, Long)]): Long = {
    import spark.implicits._
    if (edges.isEmpty) return 0L
    val pairs = edges.toDF("a", "b")
    val deg = pairs.select(col("a").as("n"))
      .unionAll(pairs.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val key = (col("deg") * lit(4294967296L) + col("n")).as("k")
    val keyed = deg.select(col("n"), key)
    val oriented = pairs
      .join(broadcast(keyed.withColumnRenamed("n", "a")
        .withColumnRenamed("k", "ka")), "a")
      .join(broadcast(keyed.withColumnRenamed("n", "b")
        .withColumnRenamed("k", "kb")), "b")
      .select(when(col("ka") < col("kb"), col("a")).otherwise(col("b")).as("u"),
        when(col("ka") < col("kb"), col("b")).otherwise(col("a")).as("v"))
    val adj = oriented.groupBy(col("u").as("n")).agg(collect_list("v").as("nb"))
    oriented
      .join(broadcast(adj.toDF("u", "nu")), Seq("u"))
      .join(broadcast(adj.toDF("v", "nv")), Seq("v"))
      .select(size(array_intersect(col("nu"), col("nv"))).cast("long").as("c"))
      .agg(coalesce(sum("c"), lit(0L))).head.getLong(0)
  }

  private def brute(edges: Seq[(Long, Long)]): Long = {
    val set = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val tri = for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      if set((nodes(i), nodes(j))) && set((nodes(i), nodes(k))) &&
        set((nodes(j), nodes(k)))
    } yield 1L
    tri.sum
  }

  test("triangle kernel equals brute force on 25 random graphs") {
    forSeeds(graphGen, 25) { edges =>
      assert(kernel(edges) == brute(edges), s"edges=$edges")
    }
  }

  test("triangle kernel: clique, star, and empty edge cases") {
    val k5 = for (i <- 0 until 5; j <- (i + 1) until 5) yield (i.toLong, j.toLong)
    assert(kernel(k5) == 10L) // C(5,3)
    val star = (1 to 6).map(i => (0L, i.toLong))
    assert(kernel(star) == 0L)
    assert(kernel(Nil) == 0L)
  }
}
