package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Union of all query providers. Add each new provider object here. */
object Registry {
  type Q = (SparkSession, String) => DataFrame

  private def providers: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (Relational.queries, Relational.oracleSql),
    (LlmQueries.queries, LlmQueries.oracleSql),
    (EventQueries.queries, EventQueries.oracleSql),
    (GeoQueries.queries, GeoQueries.oracleSql),
    (GraphBenchQueries.queries, GraphBenchQueries.oracleSql),
    (Extended.queries, Extended.oracleSql),
    (Extended2.queries, Extended2.oracleSql),
    (Extended3.queries, Extended3.oracleSql),
    (Extended4.queries, Extended4.oracleSql),
    (Extended5.queries, Extended5.oracleSql),
    (Extended6.queries, Extended6.oracleSql),
    (Extended7.queries, Extended7.oracleSql),
    (Extended8.queries, Extended8.oracleSql),
    (Extended9.queries, Extended9.oracleSql),
    (Extended10.queries, Extended10.oracleSql),
    (Extended11.queries, Extended11.oracleSql),
    (Extended12.queries, Extended12.oracleSql),
    (Extended13.queries, Extended13.oracleSql),
    (Extended14.queries, Extended14.oracleSql),
    (Extended15.queries, Extended15.oracleSql),
    (Extended16.queries, Extended16.oracleSql),
    (Extended17.queries, Extended17.oracleSql),
    (Extended18.queries, Extended18.oracleSql),
    (Extended19.queries, Extended19.oracleSql),
    (Extended20.queries, Extended20.oracleSql),
    (Extended21.queries, Extended21.oracleSql),
    (Extended22.queries, Extended22.oracleSql),
    (Extended23.queries, Extended23.oracleSql),
    (Extended24.queries, Extended24.oracleSql),
    (Extended25.queries, Extended25.oracleSql),
    (Extended26.queries, Extended26.oracleSql),
    (Extended27.queries, Extended27.oracleSql),
    (Extended28.queries, Extended28.oracleSql),
    (Extended29.queries, Extended29.oracleSql),
    (Extended30.queries, Extended30.oracleSql),
    (Extended31.queries, Extended31.oracleSql),
    (Extended32.queries, Extended32.oracleSql),
    (Extended33.queries, Extended33.oracleSql),
    (Extended34.queries, Extended34.oracleSql),
    (Extended35.queries, Extended35.oracleSql),
    (Extended36.queries, Extended36.oracleSql),
    (Extended37.queries, Extended37.oracleSql),
    (Extended38.queries, Extended38.oracleSql),
    (Extended39.queries, Extended39.oracleSql),
    (Extended40.queries, Extended40.oracleSql),
    (Extended41.queries, Extended41.oracleSql),
    (Extended42.queries, Extended42.oracleSql),
    (Extended43.queries, Extended43.oracleSql),
    (Extended44.queries, Extended44.oracleSql),
    (Extended45.queries, Extended45.oracleSql),
    (Extended46.queries, Extended46.oracleSql),
    (Extended47.queries, Extended47.oracleSql),
    (Extended48.queries, Extended48.oracleSql),
    (Extended49.queries, Extended49.oracleSql),
    (Extended50.queries, Extended50.oracleSql),
    (Extended51.queries, Extended51.oracleSql),
    (Extended52.queries, Extended52.oracleSql),
    (Extended53.queries, Extended53.oracleSql),
    (Extended54.queries, Extended54.oracleSql),
    (Extended55.queries, Extended55.oracleSql),
    (Extended56.queries, Extended56.oracleSql),
    (Extended57.queries, Extended57.oracleSql),
    (Extended58.queries, Extended58.oracleSql),
    (Extended59.queries, Extended59.oracleSql),
    (Extended60.queries, Extended60.oracleSql)
  )

  def queries: Map[String, Q] = providers.map(_._1).reduce(_ ++ _)
  def oracleSql: Map[String, String] = providers.map(_._2).reduce(_ ++ _)
}
