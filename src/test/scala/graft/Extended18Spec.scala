package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch-18 pins: the XML format family aggregates exactly as the
  * arithmetic predicts, and each streaming replay equals its batch twin
  * computed in the same session (stronger than the shared oracle: the
  * two plans run on identical input bytes here).
  */
class Extended18Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("s12 ingests identical aggregates from KML, GML and OSM renderings") {
    val rows = graft.queries.Extended18.queries("s12_xml_ingest")(spark, sf).collect()
    assert(rows.length == 3)
    // 25 nations → 50 directed edges, 50 distinct sources, w-sum
    // 2 * (0+1+...+24) = 600 in every layer
    val expectMax = graft.Tables.t(spark, sf, "nation")
      .agg(max("n_name")).head.getString(0)
    rows.foreach { r =>
      assert(r.getLong(1) == 50L, s"n_edges in $r")
      assert(r.getLong(2) == 50L, s"n_nodes in $r")
      assert(r.getLong(3) == 600L, s"sum_w in $r")
      assert(r.getString(4) == expectMax, s"max_name in $r")
    }
    assert(rows.map(_.getString(0)).toSeq == Seq("xml_gml", "xml_kml", "xml_osm"))
  }

  test("streaming hourly aggregate replays to the exact batch result") {
    val streamed = graft.queries.Extended18.queries("st1_stream_hourly")(spark, sf)
    val batch = graft.queries.Registry.queries("e1_hourly_agg")(spark, sf)
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("streaming funnel join replays to the exact batch interval join") {
    val streamed = graft.queries.Extended18.queries("st2_stream_funnel")(spark, sf)
      .collect().toSet
    val ev = graft.Tables.events(spark, sf)
    val a = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("ta"), col("event_id").as("click_id"))
    val b = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("ub"), col("ts").as("tb"),
        col("event_id").as("purchase_id"))
    val batch = a.join(b, a("user_id") === b("ub") &&
        b("tb") >= a("ta") && b("tb") <= a("ta") + expr("interval 1 hour"))
      .select(col("user_id"), col("click_id"), col("purchase_id"))
      .collect().toSet
    assert(streamed == batch)
  }
}
