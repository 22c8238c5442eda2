package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

import graft.geo.Wkb
import graft.operators.AsOfJoin
import graft.plans.GroupTopK

/** Property-based tests over the pure kernels and the custom operators:
  * randomized inputs (ScalaCheck generators sampled at fixed seeds, so
  * failures reproduce) against brute-force local models. Pure-codec
  * properties run hundreds of cases; Spark-job properties run a handful
  * (each case is a full distributed job).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Deterministic property driver: sample `gen` at `n` fixed seeds and
    * run the assertion block per case (raw ScalaCheck; the scalatest
    * bridge artifact is not on the offline classpath).
    */
  private def forSeeds[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      val a = gen(Gen.Parameters.default, Seed(0xC0FFEE + i * 7919L))
        .getOrElse(fail(s"generator failed at seed $i"))
      body(a)
    }

  // ---- Wkb codec: encode/decode is the identity on coordinates ----
  private val coordGen: Gen[Seq[Double]] = for {
    lon <- Gen.chooseNum(-180.0, 180.0)
    lat <- Gen.chooseNum(-90.0, 90.0)
  } yield Seq(lon, lat)

  test("Wkb linestring roundtrip preserves every coordinate bit-exactly") {
    forSeeds(Gen.nonEmptyListOf(coordGen), 100) { coords =>
      val (tpe, back) = Wkb.decode(Wkb.encodeLineString(coords))
      assert(tpe == 2) // WKB LineString
      assert(back.map(_.toList) == coords.map(_.toList))
    }
  }

  test("Wkb gpkg envelope wrap/unwrap is the identity on the payload") {
    forSeeds(Gen.nonEmptyListOf(coordGen), 50) { coords =>
      val wkb = Wkb.encodeLineString(coords)
      val (srid, inner) = Wkb.decodeGpkg(Wkb.encodeGpkg(wkb))
      assert(srid == Wkb.Srid4326)
      assert(inner.toSeq == wkb.toSeq)
    }
  }

  // ---- ZOrder: interleave is injective and quadrant-monotone ----
  test("ZOrder interleave is injective over a random cell sample") {
    import spark.implicits._
    val cellGen = Gen.chooseNum(0, (1 << 10) - 1)
    forSeeds(Gen.listOfN(200, Gen.zip(cellGen, cellGen)), 3) { cells =>
      val distinct = cells.distinct
      val df = distinct.toDF("x", "y")
        .select(col("x"), col("y"),
          graft.spatial.ZOrder.interleave(col("x"), col("y"), 10).as("z"))
      val rows = df.collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))
      assert(rows.map(_._2).distinct.length == distinct.length,
        "distinct cells must get distinct z-codes")
    }
  }

  // ---- AsOfJoin == brute-force backward scan ----
  test("as-of backward join equals the brute-force latest-at-or-before scan") {
    import spark.implicits._
    val rowGen = for {
      k <- Gen.chooseNum(0, 3)
      ts <- Gen.chooseNum(0L, 50L)
      v <- Gen.chooseNum(0, 1000)
    } yield (k, ts, v)
    forSeeds(Gen.zip(Gen.listOfN(40, rowGen), Gen.listOfN(25, rowGen)),
        4) { case (ls, rs) =>
      // right side must be unique per (key, ts): as-of ties among right
      // rows are deterministic-but-arbitrary, so the brute-force model
      // dedups the same way only if there is nothing to tie on
      val rsu = rs.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val left = ls.toDF("k", "ts", "lv")
      val right = rsu.toDF("k", "ts", "rv")
      val got = AsOfJoin.backward(left, right, Seq("k"), "ts")
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getInt(2),
          Option(r.get(3)).map(_.asInstanceOf[Int])))
        .sortBy(t => (t._1, t._2, t._3))
      val want = ls.map { case (k, ts, lv) =>
        val cand = rsu.filter(r => r._1 == k && r._2 <= ts)
        val rv = if (cand.isEmpty) None
          else Some(cand.maxBy(_._2)._3)
        (k, ts, lv, rv)
      }.sortBy(t => (t._1, t._2, t._3))
      assert(got.toSeq == want)
    }
  }

  test("as-of forward join equals the brute-force earliest-at-or-after scan") {
    import spark.implicits._
    val rowGen = for {
      k <- Gen.chooseNum(0, 3)
      ts <- Gen.chooseNum(0L, 50L)
      v <- Gen.chooseNum(0, 1000)
    } yield (k, ts, v)
    forSeeds(Gen.zip(Gen.listOfN(40, rowGen), Gen.listOfN(25, rowGen)),
        4) { case (ls, rs) =>
      val rsu = rs.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val left = ls.toDF("k", "ts", "lv")
      val right = rsu.toDF("k", "ts", "rv")
      val got = AsOfJoin.forward(left, right, Seq("k"), "ts")
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getInt(2),
          Option(r.get(3)).map(_.asInstanceOf[Int])))
        .sortBy(t => (t._1, t._2, t._3))
      val want = ls.map { case (k, ts, lv) =>
        val cand = rsu.filter(r => r._1 == k && r._2 >= ts)
        val rv = if (cand.isEmpty) None
          else Some(cand.minBy(_._2)._3)
        (k, ts, lv, rv)
      }.sortBy(t => (t._1, t._2, t._3))
      assert(got.toSeq == want)
    }
  }

  // ---- GroupTopK == per-group sort-take ----
  test("GroupTopK equals per-group sort-and-take on random data") {
    import spark.implicits._
    val rowGen = for {
      g <- Gen.chooseNum(0, 4)
      v <- Gen.chooseNum(0, 30)
      id <- Gen.chooseNum(0, 10000)
    } yield (g, v, id)
    forSeeds(Gen.listOfN(120, rowGen), 4) { rows0 =>
      val rows = rows0.distinct
      val df = rows.toDF("g", "v", "id")
      val got = GroupTopK.topK(df, Seq("g"), Seq(("v", false), ("id", true)), 3)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
        .sortBy(identity).toSeq
      val want = rows.groupBy(_._1).toSeq.flatMap { case (_, g) =>
        g.sortBy(r => (-r._2, r._3)).take(3)
      }.sortBy(identity)
      assert(got == want)
    }
  }

  // ---- zero-row edges: operators must not throw or fabricate rows ----
  test("as-of joins and GroupTopK handle empty inputs") {
    import spark.implicits._
    val empty = Seq.empty[(Int, Long, Int)].toDF("k", "ts", "v")
    val some = Seq((1, 5L, 10)).toDF("k", "ts", "v")
    // empty right: every left row carries null
    val bwd = AsOfJoin.backward(some, empty.withColumnRenamed("v", "rv"),
      Seq("k"), "ts").collect()
    assert(bwd.length == 1 && bwd.head.isNullAt(3))
    val fwd = AsOfJoin.forward(some, empty.withColumnRenamed("v", "rv"),
      Seq("k"), "ts").collect()
    assert(fwd.length == 1 && fwd.head.isNullAt(3))
    // empty left: no output rows
    assert(AsOfJoin.backward(empty, some.withColumnRenamed("v", "rv"),
      Seq("k"), "ts").count() == 0)
    // GroupTopK of nothing is nothing
    assert(GroupTopK.topK(empty, Seq("k"), Seq(("ts", true)), 3).count() == 0)
  }

  // ---- exact dedup keep-first is idempotent and order-insensitive ----
  test("exact dedup output is invariant under input permutation") {
    import spark.implicits._
    val docGen = for {
      id <- Gen.chooseNum(1L, 500L)
      text <- Gen.oneOf("alpha beta", "gamma", "delta eps", "alpha beta")
    } yield (id, text)
    forSeeds(Gen.listOfN(30, docGen), 4) { docs0 =>
      val docs = docs0.distinctBy(_._1)
      val a = graft.llm.Dedup.exact(docs.toDF("doc_id", "text"),
        "doc_id", "text").collect().map(_.getLong(0)).sorted.toSeq
      val b = graft.llm.Dedup.exact(docs.reverse.toDF("doc_id", "text"),
        "doc_id", "text").collect().map(_.getLong(0)).sorted.toSeq
      assert(a == b)
      // keep-first: the survivor of each text group is its min doc_id
      val want = docs.groupBy(_._2).values.map(_.map(_._1).min).toSeq.sorted
      assert(a == want)
    }
  }
}
