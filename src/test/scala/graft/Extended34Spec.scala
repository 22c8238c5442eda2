package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-34 operators against local recomputations at sf0.001 (DuckDB
  * hash gate at sf0.01 via Verify/oracle_check).
  */
class Extended34Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"
  private def q(name: String) =
    graft.queries.Extended34.queries(name)(spark, d)

  test("u6 bag set-ops preserve multiplicities (min / difference rules)") {
    val cn = Tables.t(spark, d, "customer").select("c_nationkey").collect()
      .map(_.getInt(0)).groupBy(identity).map { case (k, v) => k -> v.size }
    val sn = Tables.t(spark, d, "supplier").select("s_nationkey").collect()
      .map(_.getInt(0)).groupBy(identity).map { case (k, v) => k -> v.size }
    val rows = q("u6_bag_setops").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    (cn.keySet ++ sn.keySet).foreach { k =>
      val c = cn.getOrElse(k, 0); val s0 = sn.getOrElse(k, 0)
      val wantI = math.min(c, s0).toLong
      val wantE = math.max(c - s0, 0).toLong
      if (wantI > 0 || wantE > 0) {
        val (gi, ge) = rows(k)
        assert(gi == wantI && ge == wantE, s"key $k")
      } else assert(!rows.contains(k))
    }
  }

  test("dedup containment finds asymmetric subset inclusion Jaccard dilutes") {
    val rows = q("dedup_containment").collect()
    assert(rows.nonEmpty)
    // containment in (0, 1]; ordered desc
    val cs = rows.map(_.getDouble(2))
    assert(cs.forall(c => c > 0 && c <= 1.0))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    // asymmetry sanity: c(a→b) uses |A|, so a pair listed both ways may
    // carry different scores — recompute one pair locally
    val (a, b) = (rows.head.getLong(0), rows.head.getLong(1))
    def shingles(id: Long): Set[String] = {
      val txt = Tables.t(spark, d, "documents")
        .filter(col("doc_id") === id).select("text").head.getString(0)
      val ws = txt.split(" ")
      (0 until math.max(ws.length - 2, 0))
        .map(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}").toSet
    }
    val (sa, sb) = (shingles(a), shingles(b))
    val want = BigDecimal((sa & sb).size.toDouble / sa.size)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.head.getDouble(2) == want)
  }

  test("r9 walks are reproducible and follow real edges") {
    val w1 = q("r9_hash_walk").collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2)))
    val w2 = q("r9_hash_walk").collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(w1.toSeq == w2.toSeq) // deterministic across runs
    val li = Tables.t(spark, d, "lineitem")
      .filter(col("l_linenumber") <= 3)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.toSeq
      for (x <- ps; y <- ps if x != y) yield (x, y)
    }.toSet
    w1.groupBy(_._1).foreach { case (_, steps) =>
      val path = steps.sortBy(_._2).map(_._3)
      path.zip(path.tail).foreach { case (u, v) =>
        assert(edges.contains((u, v)), s"walk edge $u->$v not in graph")
      }
    }
  }

  test("w10 carry-forward equals a local scan with null-skipping") {
    val got = q("w10_ignore_nulls").collect()
      .map(r => r.getLong(1) -> (
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    // recompute from the source in WINDOW order (ts, event_id), which the
    // output order (user_id, event_id) need not match
    val ev = Tables.t(spark, d, "events")
      .select(col("user_id"), col("ts").cast("long").as("ts"), col("event_id"),
        when(col("event_type") === "purchase", round(col("value"), 2)).as("pv"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    ev.groupBy(_._1).foreach { case (_, es) =>
      var carry: Option[Double] = None
      es.sortBy(e => (e._2, e._3)).foreach { case (_, _, id, pv) =>
        val (cf, prev) = got(id)
        assert(prev == carry, s"event $id lag") // carry BEFORE this row
        if (pv.isDefined) carry = pv
        assert(cf == carry, s"event $id last") // carry INCLUDING this row
      }
    }
  }
}
