package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-32 pipeline-report operators against local recomputations at
  * sf0.001 (DuckDB hash gate at sf0.01 via Verify/oracle_check).
  */
class Extended32Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"
  private def q(name: String) =
    graft.queries.Extended32.queries(name)(spark, d)

  test("tp10 funnel stages are monotone and chain n_out -> next n_in") {
    val rows = q("tp10_quality_funnel").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 4)
    rows.foreach { case (_, in, out) => assert(out <= in) }
    // the funnel chains: each stage's n_out is some other stage's n_in
    // (stages are emitted sorted by n_in, ascending = reverse pipeline)
    val byStage = rows.map(r => r._1 -> r).toMap
    assert(byStage("lang_en")._2 == byStage("length_ge_100")._3)
    assert(byStage("tokens_ge_20")._2 == byStage("lang_en")._3)
    assert(byStage("exact_dedup")._2 == byStage("tokens_ge_20")._3)
    val docs = Tables.t(spark, d, "documents").count()
    assert(byStage("length_ge_100")._2 == docs)
  }

  test("tp11 per-source token totals respect the quota and are md5-prefix") {
    val nSources = Tables.t(spark, d, "documents")
      .select("source").distinct().count()
    val quota = 50000L / nSources
    val rows = q("tp11_token_budget_mix").collect()
    rows.foreach(r => assert(r.getLong(2) <= quota))
    // recompute one source's prefix locally
    val src = rows.head.getString(0)
    val docs = Tables.t(spark, d, "documents").filter(col("source") === src)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("toks"),
        md5(col("doc_id").cast("string").cast("binary")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(r => (r._3, r._1))
    var cum = 0L; var n = 0L; var kept = 0L
    docs.foreach { case (_, t, _) =>
      cum += t; if (cum <= quota) { n += 1; kept += t } }
    assert(rows.head.getLong(1) == n && rows.head.getLong(2) == kept)
  }

  test("e22 transition counts match a local per-user lag walk") {
    val ev = Tables.t(spark, d, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3)))
    val want = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      sorted.zip(sorted.tail).map { case (a, b) => (a._4, b._4) }
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = q("e22_transition_matrix").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want)
    // shares sum to 1 per prev_type
    q("e22_transition_matrix").collect().groupBy(_.getString(0))
      .foreach { case (_, rs) =>
        assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-4) }
  }
}
