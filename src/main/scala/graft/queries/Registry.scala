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
    (Extended60.queries, Extended60.oracleSql),
    (Extended61.queries, Extended61.oracleSql),
    (Extended62.queries, Extended62.oracleSql),
    (Extended63.queries, Extended63.oracleSql),
    (Extended64.queries, Extended64.oracleSql),
    (Extended65.queries, Extended65.oracleSql),
    (Extended66.queries, Extended66.oracleSql),
    (Extended67.queries, Extended67.oracleSql),
    (Extended68.queries, Extended68.oracleSql),
    (Extended69.queries, Extended69.oracleSql),
    (Extended70.queries, Extended70.oracleSql),
    (Extended71.queries, Extended71.oracleSql),
    (Extended72.queries, Extended72.oracleSql),
    (Extended73.queries, Extended73.oracleSql),
    (Extended74.queries, Extended74.oracleSql),
    (Extended75.queries, Extended75.oracleSql),
    (Extended76.queries, Extended76.oracleSql),
    (Extended77.queries, Extended77.oracleSql),
    (Extended78.queries, Extended78.oracleSql),
    (Extended79.queries, Extended79.oracleSql),
    (Extended80.queries, Extended80.oracleSql),
    (Extended81.queries, Extended81.oracleSql),
    (Extended82.queries, Extended82.oracleSql),
    (Extended83.queries, Extended83.oracleSql),
    (Extended84.queries, Extended84.oracleSql),
    (Extended85.queries, Extended85.oracleSql),
    (Extended86.queries, Extended86.oracleSql),
    (Extended87.queries, Extended87.oracleSql),
    (Extended88.queries, Extended88.oracleSql),
    (Extended89.queries, Extended89.oracleSql),
    (Extended90.queries, Extended90.oracleSql),
    (Extended91.queries, Extended91.oracleSql),
    (Extended92.queries, Extended92.oracleSql),
    (Extended93.queries, Extended93.oracleSql),
    (Extended94.queries, Extended94.oracleSql),
    (Extended95.queries, Extended95.oracleSql),
    (Extended96.queries, Extended96.oracleSql),
    (Extended97.queries, Extended97.oracleSql),
    (Extended98.queries, Extended98.oracleSql),
    (Extended99.queries, Extended99.oracleSql),
    (Extended100.queries, Extended100.oracleSql),
    (Extended101.queries, Extended101.oracleSql),
    (Extended102.queries, Extended102.oracleSql),
    (Extended103.queries, Extended103.oracleSql),
    (Extended104.queries, Extended104.oracleSql),
    (Extended105.queries, Extended105.oracleSql),
    (Extended106.queries, Extended106.oracleSql),
    (Extended107.queries, Extended107.oracleSql),
    (Extended108.queries, Extended108.oracleSql),
    (Extended109.queries, Extended109.oracleSql),
    (Extended110.queries, Extended110.oracleSql),
    (Extended111.queries, Extended111.oracleSql),
    (Extended112.queries, Extended112.oracleSql),
    (Extended113.queries, Extended113.oracleSql),
    (Extended114.queries, Extended114.oracleSql),
    (Extended115.queries, Extended115.oracleSql),
    (Extended116.queries, Extended116.oracleSql),
    (Extended117.queries, Extended117.oracleSql),
    (Extended118.queries, Extended118.oracleSql),
    (Extended119.queries, Extended119.oracleSql),
    (Extended120.queries, Extended120.oracleSql),
    (Extended121.queries, Extended121.oracleSql),
    (Extended122.queries, Extended122.oracleSql)
  )

  def queries: Map[String, Q] = {
    val merged = providers.map(_._1).reduce(_ ++ _)
    // a duplicate key across providers would silently shadow the earlier
    // query (Map ++ keeps the last) — fail loudly instead
    require(merged.size == providers.map(_._1.size).sum,
      "duplicate query key across providers: " +
        providers.flatMap(_._1.keys).groupBy(identity)
          .collect { case (k, v) if v.size > 1 => k }.mkString(", "))
    merged
  }
  def oracleSql: Map[String, String] = {
    val merged = providers.map(_._2).reduce(_ ++ _)
    // same last-wins hazard as `queries`: a provider redefining another's
    // oracle key would silently verify the wrong SQL — fail loudly
    require(merged.size == providers.map(_._2.size).sum,
      "duplicate oracle key across providers: " +
        providers.flatMap(_._2.keys).groupBy(identity)
          .collect { case (k, v) if v.size > 1 => k }.mkString(", "))
    merged
  }
}
