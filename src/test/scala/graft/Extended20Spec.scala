package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the twentieth extension batch — the
  * training-data shaping layer (sequence packing, LM familiarity,
  * incremental dedup, epoch sharding, domain mixing) and GraphX strongly
  * connected components. Each distributed result is re-derived by an
  * independent single-machine computation over the collected fixture
  * corpus, so the proofs do not share code (or mistakes) with the
  * implementations.
  */
class Extended20Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"
  def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val docs: Seq[(Long, String)] =
    Tables.t(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq

  test("tp1 packing tiles the token stream exactly: totals, capacity, span counts") {
    val rows = q("tp1_sequence_pack").collect()
    assert(rows.nonEmpty)
    val total = docs.map(_._2.split(" ").length.toLong).sum
    // every token lands in exactly one sequence
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == total)
    // every sequence except the last is exactly full
    val cap = 256L
    rows.dropRight(1).foreach(r => assert(r.getAs[Long]("n_tokens") == cap))
    assert(rows.last.getAs[Long]("n_tokens") == (if (total % cap == 0) cap else total % cap))
    // sequence ids are the contiguous range 0..ceil(total/cap)-1
    assert(rows.map(_.getAs[Long]("seq_id")).toSeq ==
      (0L until (total + cap - 1) / cap).toSeq)
    // independent replay: each doc's [start, end) span from a local scan
    var off = 0L
    val expected = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
    docs.foreach { case (id, text) =>
      val len = text.split(" ").length.toLong
      (off / cap) to ((off + len - 1) / cap) foreach { s =>
        val overlap = math.min(off + len, (s + 1) * cap) - math.max(off, s * cap)
        val (d, t, f) = expected.getOrElse(s, (0L, 0L, Long.MaxValue))
        expected(s) = (d + 1, t + overlap, math.min(f, id))
      }
      off += len
    }
    rows.foreach { r =>
      val (d, t, f) = expected(r.getAs[Long]("seq_id"))
      assert(r.getAs[Long]("n_docs") == d)
      assert(r.getAs[Long]("n_tokens") == t)
      assert(r.getAs[Long]("first_doc") == f)
    }
  }

  test("tp2 familiarity matches an independent local bigram count") {
    val counts = scala.collection.mutable.Map[(String, String), Long]()
    def bigrams(text: String) = { val ws = text.split(" "); ws.zip(ws.tail) }
    docs.foreach(d => bigrams(d._2).foreach(g =>
      counts(g) = counts.getOrElse(g, 0L) + 1))
    val rows = q("tp2_lm_familiarity").collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(rows.length == docs.count(_._2.split(" ").length >= 2))
    docs.filter(_._2.split(" ").length >= 2).foreach { case (id, text) =>
      val gs = bigrams(text)
      val mass = gs.map(counts).sum
      val hapax = gs.count(counts(_) == 1L)
      val r = byId(id)
      // HALF_UP over the shortest decimal repr — the same contract as
      // Spark's round() (BigDecimal.valueOf + HALF_UP), so exact .5 ties
      // at the 4th decimal (e.g. 1/32) don't flake the way rint would
      def r4(x: Double) = BigDecimal.valueOf(x)
        .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Long]("n_bigrams") == gs.length.toLong, s"doc $id")
      assert(r.getAs[Double]("familiarity") == r4(mass.toDouble / gs.length), s"doc $id")
      assert(r.getAs[Double]("hapax_rate") == r4(hapax.toDouble / gs.length), s"doc $id")
    }
  }

  test("tp3 incremental dedup classifies the new batch against base and itself") {
    val fp = docs.map { case (id, text) =>
      (id, text.split(" ").distinct.sorted.mkString(" "))
    }
    val baseFps = fp.filter(_._1 % 10 < 8).map(_._2).toSet
    val batch = fp.filter(_._1 % 10 >= 8)
    val firstOf = batch.groupBy(_._2).map { case (t, xs) => t -> xs.map(_._1).min }
    val expected = batch.map { case (id, text) =>
      id -> (if (baseFps(text)) "dup_of_base"
             else if (id > firstOf(text)) "dup_in_batch" else "new")
    }.toMap
    val rows = q("tp3_incremental_dedup").collect()
    assert(rows.length == batch.length)
    rows.foreach(r => assert(r.getString(1) == expected(r.getLong(0)), s"doc ${r.getLong(0)}"))
    // the split must actually exercise the base-collision path at this sf
    assert(rows.exists(_.getString(1) != "new"))
  }

  test("tp4 epoch shard shuffle is a deterministic permutation with dense per-shard ranks") {
    val rows = q("tp4_shard_shuffle").collect()
    assert(rows.length == docs.length)
    // positions within each shard are exactly 1..|shard|
    rows.groupBy(_.getString(1)).foreach { case (shard, rs) =>
      assert(rs.map(_.getAs[Int]("pos")).sorted.toSeq == (1 to rs.length).toSeq,
        s"shard $shard")
    }
    // deterministic: a second run yields the identical assignment
    val again = q("tp4_shard_shuffle").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // seeded: the hash actually scrambles doc order (not identity-sorted);
    // checked on the largest shard so the assertion has real support
    val biggest = rows.groupBy(_.getString(1)).values.maxBy(_.length)
    assert(biggest.length >= 3)
    val ids = biggest.sortBy(_.getAs[Int]("pos")).map(_.getLong(0)).toSeq
    assert(ids != ids.sorted)
  }

  test("tp5 domain mix takes exactly min(k, |source|) lowest-hash docs per source") {
    val bySource = Tables.t(spark, sf, "documents").select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1))).groupBy(_._2)
    def hash(id: Long) = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val rows = q("tp5_domain_mix").collect()
    val got = rows.map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    bySource.foreach { case (src, members) =>
      val want = members.map(_._1).sortBy(id => (hash(id), id)).take(20).toSet
      assert(got.getOrElse(src, Array.empty).map(_._2).toSet == want, s"source $src")
    }
  }

  test("r3 GraphX SCC equals a local cycle decomposition of the affine map") {
    // sf0.01: all 311 residues are present, so the permutation's full
    // cycle structure (31 ten-cycles + 1 fixed point) is exercised; the
    // sf0.001 partial-residue case (broken cycles → singletons) is what
    // the query's left_semi edge filter handles and the oracle replays
    val sf = "/root/testdata/sf0.01"
    def q(name: String) = SparkEntry.queries(name)(spark, sf)
    val present = Tables.t(spark, sf, "customer").select("c_custkey").collect()
      .map(_.getLong(0) % 311).toSet
    val next = present.iterator.map(u => u -> (u * 95 + 5) % 311)
      .filter(e => present(e._2)).toMap
    // local SCC of a partial functional graph: u is on a cycle iff the walk
    // from u returns to u; the cycle's members share min-id as the label,
    // everything else is a singleton
    def cycleOf(u: Long): Option[Seq[Long]] = {
      var v = next.get(u); val seen = scala.collection.mutable.ArrayBuffer(u)
      while (v.nonEmpty && v.get != u && seen.length <= present.size) {
        seen += v.get; v = next.get(v.get)
      }
      if (v.contains(u)) Some(seen.toSeq) else None
    }
    val expected = scala.collection.mutable.Map[Long, (Long, Long)]()
    present.foreach { u =>
      if (!expected.contains(u)) cycleOf(u) match {
        case Some(cyc) =>
          val id = cyc.min
          cyc.foreach(m => expected(m) = (id, cyc.length.toLong))
        case None => expected(u) = (u, 1L)
      }
    }
    val rows = q("r3_scc").collect()
    assert(rows.length == present.size)
    rows.foreach { r =>
      val (id, size) = expected(r.getAs[Long]("node"))
      assert(r.getAs[Long]("scc_id") == id, s"node ${r.get(0)}")
      assert(r.getAs[Long]("scc_size") == size, s"node ${r.get(0)}")
    }
    // the topology is non-trivial at this sf: at least one multi-node SCC
    assert(rows.exists(_.getAs[Long]("scc_size") > 1))
  }
}
