package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-24 queries against independent local recomputations on sf0.001. */
class Extended24Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  test("e19 three-step funnel equals a per-user local fold") {
    val got = graft.queries.Extended24.queries("e19_funnel3")(spark, d)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getInt(4)))
      .toMap

    val ev = Tables.events(spark, d)
      .select(col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("sec"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val want = byUser.flatMap { case (u, rows) =>
      val clicks = rows.filter(_._2 == "click").map(_._3)
      if (clicks.isEmpty) None
      else {
        val tc = clicks.min
        val tv = rows.filter(r => r._2 == "view" && r._3 >= tc && r._3 <= tc + 86400)
          .map(_._3).minOption
        val tp = tv.flatMap(v => rows
          .filter(r => r._2 == "purchase" && r._3 >= v && r._3 <= v + 86400)
          .map(_._3).minOption)
        val stage = 1 + tv.map(_ => 1).getOrElse(0) + tp.map(_ => 1).getOrElse(0)
        Some(u -> (tc, tv.getOrElse(-1L), tp.getOrElse(-1L), stage))
      }
    }
    assert(got == want)
    assert(got.nonEmpty && got.values.exists(_._4 == 3)) // funnel completes for someone
  }

  test("tp7 decontaminated split equals local 5-gram set logic") {
    val got = graft.queries.Extended24.queries("tp7_decontaminated_split")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    val docs = Tables.t(spark, d, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def grams(text: String): Set[String] = {
      val ws = text.split(" ").filter(_.nonEmpty)
      if (ws.length < 5) Set.empty
      else ws.sliding(5).map(_.mkString(" ")).toSet
    }
    val evalGrams = docs.filter(_._1 % 20 == 0).flatMap(d0 => grams(d0._2)).toSet
    val want = docs.map { case (id, text) =>
      id -> (if (id % 20 == 0) "eval"
        else if (grams(text).exists(evalGrams)) "dropped"
        else "train")
    }.toMap
    assert(got == want)
    assert(Set("eval", "train").subsetOf(got.values.toSet)) // both splits present
  }
}
