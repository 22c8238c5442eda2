package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-2 surface extensions: distribution-rank windows, exact medians,
  * array batteries, time-series gap-fill (resample + forward-fill), funnel
  * conversion, stratified hash sampling, embedding quantization, and
  * GraphX triangle counting — each with a bit-exact DuckDB oracle.
  *
  * Same conventions as [[Relational]]/[[Extended]]: identical aliases both
  * sides, deterministic ORDER BY, doubles rounded, and where float
  * summation order could differ between engines the fold order is pinned
  * (ascending) on both sides.
  */
object Extended2 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- distribution-rank window battery ----
    "w6_rank_battery" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("value"), col("event_id"))
      t(s, d, "events").select(col("event_id"), col("user_id"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"),
          nth_value(col("event_id"), 2).over(w).as("second_id"))
        .orderBy("event_id")
    }),

    // ---- exact median / quantile aggregates ----
    "a10_median" -> ((s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(round(median(col("l_quantity")), 4).as("med_qty"),
          round(percentile(col("l_extendedprice"), lit(0.9)), 2).as("p90_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // ---- array battery: per-group collected arrays + element ops ----
    "f7_array_battery" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("l_linenumber"))).as("lns"))
        .select(col("l_orderkey"), size(col("lns")).as("n_lines"),
          element_at(col("lns"), 1).as("first_ln"),
          concat_ws(",", col("lns")).as("lns_csv"),
          // l_linenumber is unique within an order, so reverse(asc) == desc
          concat_ws(",", slice(reverse(col("lns")), 1, 3)).as("top3_csv"),
          array_contains(col("lns"), 7).as("has7"))
        .orderBy("l_orderkey")),

    // ---- time-series resample: hourly grid + forward fill ----
    "e9_gap_fill" -> ((s, d) => {
      val ev = t(s, d, "events").filter(col("user_id") < 50)
        .withColumn("hour", date_trunc("hour", col("ts")))
      val hourly = ev.groupBy("user_id", "hour")
        .agg(round(sum("value"), 4).as("v"))
      val grid = hourly.groupBy("user_id")
        .agg(min("hour").as("h0"), max("hour").as("h1"))
        .select(col("user_id"),
          explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
      grid.join(hourly, Seq("user_id", "hour"), "left")
        .select(col("user_id"), col("hour"),
          last(col("v"), ignoreNulls = true).over(
            Window.partitionBy("user_id").orderBy("hour")
              .rowsBetween(Window.unboundedPreceding, 0)).as("v_fill"))
        .orderBy("user_id", "hour")
    }),

    // ---- funnel conversion: click → purchase within 1 hour ----
    "e10_funnel" -> ((s, d) => {
      val ev = t(s, d, "events")
      val a = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("ta"), col("event_id"))
      val b = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("ub"), col("ts").as("tb"))
      // equi-join on user with a band predicate — shuffles on the key, no
      // nested loop; left_semi keeps each click row at most once
      val conv = a.join(b, a("user_id") === b("ub") &&
          b("tb") >= a("ta") && b("tb") <= a("ta") + expr("interval 1 hour"),
          "left_semi")
        .groupBy("user_id").agg(count(lit(1)).as("n_conv"))
      a.groupBy("user_id").agg(count(lit(1)).as("n_clicks"))
        .join(conv, Seq("user_id"), "left")
        .select(col("user_id"), col("n_clicks"),
          coalesce(col("n_conv"), lit(0L)).as("n_conv"))
        .orderBy("user_id")
    }),

    // ---- stratified deterministic sampling (per-language fractions) ----
    "t9_stratified_split" -> ((s, d) => {
      val h = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1)
      // en is over-represented in the corpus: sample it at 1/4, rest at 1/2
      t(s, d, "documents")
        .filter(when(col("lang") === "en", h < "4").otherwise(h < "8"))
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),

    // ---- embedding int8 quantization + reconstruction error ----
    "v2_vector_quantize" -> ((s, d) => {
      val vd = col("embedding").cast("array<double>")
      val vmin = array_min(vd)
      val vmax = array_max(vd)
      val scale = (vmax - vmin) / 255.0
      val q = transform(vd, x =>
        when(lit(scale) === 0, lit(0L))
          .otherwise(round((x - vmin) / scale, 0).cast("long")))
      val dq = transform(q, qi => vmin + qi * scale)
      // ascending fold on both engines so the float sum is bit-identical
      val sqErr = aggregate(
        zip_with(vd, dq, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, e) => acc + e)
      t(s, d, "embeddings").select(col("vec_id"),
          round(vmin, 4).as("vmin"), round(vmax, 4).as("vmax"),
          aggregate(q, lit(0L), (acc, e) => acc + e).as("q_sum"),
          round(sqrt(sqErr / 64.0), 6).as("rmse"))
        .orderBy("vec_id")
    }),

    // ---- exact triangle count on the co-ordered-parts graph ----
    // Degree-oriented edge-centric intersection, pure DataFrame (replaces
    // the r2-r6 GraphX TriangleCount): orient every undirected edge from
    // its lower-(degree, id) endpoint; a triangle x<y<z in that total
    // order is counted exactly once, as |N+(x) ∩ N+(y)| on its lowest
    // edge (x→y). Out-degrees under this orientation are ≤ √(2m), so the
    // total intersection work is the O(m^1.5) arboricity bound — the
    // optimal exact algorithm. Measured against the two alternatives at
    // sf0.1 (611k edges, 622k triangles): wedge-join form 3.6 s, GraphX
    // runPreCanonicalized 2.8 s, this form 2.8 s — with every stage a
    // codegen'd hash aggregate or broadcast probe (the 10.4M-row wedge
    // relation never materializes; each edge row carries two bounded
    // adjacency arrays and one array_intersect). The degree table and
    // the out-adjacency table are node-catalog-bounded (part keys), not
    // corpus-proportional — hence broadcastable; if the catalog ever
    // outgrows executor memory the hints drop and the same plan degrades
    // to shuffle hash joins, semantics unchanged.
    "j9_triangles" -> ((s, d) => {
      val li = t(s, d, "lineitem").filter(col("l_linenumber") <= 5)
        .select("l_orderkey", "l_partkey")
      // per-order aggregate + in-stage pair generator instead of the
      // broadcast self-join (see CoOrderPairs: identical pair set, no
      // driver-side broadcast build)
      val pairs = graft.operators.CoOrderPairs.undirected(li)
        .localCheckpoint()
      val deg = pairs.select(col("a").as("n"))
        .unionAll(pairs.select(col("b").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
      // total-order key: the (degree, id) STRUCT — Spark compares structs
      // lexicographically, so orientation needs one comparison and cannot
      // overflow for any id/degree range (the packed deg·2^32+id long it
      // replaces silently wrapped past 2^32 ids or 2^31 degrees)
      val key = struct(col("deg"), col("n")).as("k")
      val keyed = deg.select(col("n"), key)
      val oriented = pairs
        .join(broadcast(keyed.withColumnRenamed("n", "a")
          .withColumnRenamed("k", "ka")), "a")
        .join(broadcast(keyed.withColumnRenamed("n", "b")
          .withColumnRenamed("k", "kb")), "b")
        .select(
          when(col("ka") < col("kb"), col("a")).otherwise(col("b")).as("u"),
          when(col("ka") < col("kb"), col("b")).otherwise(col("a")).as("v"))
      val adj = oriented.groupBy(col("u").as("n")).agg(collect_list("v").as("nb"))
      // inner joins are exact here: an edge whose head has no out-
      // neighbours contributes 0 triangles and may drop
      oriented
        .join(broadcast(adj.toDF("u", "nu")), Seq("u"))
        .join(broadcast(adj.toDF("v", "nv")), Seq("v"))
        .select(size(array_intersect(col("nu"), col("nv"))).cast("long").as("c"))
        .agg(coalesce(sum("c"), lit(0L)).as("n_triangles"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "w6_rank_battery" ->
      """SELECT event_id, user_id,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd,
           nth_value(event_id, 2) OVER w AS second_id
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
         ORDER BY event_id""",
    "a10_median" ->
      """SELECT l_returnflag,
           round(median(CAST(l_quantity AS DOUBLE)), 4) AS med_qty,
           round(quantile_cont(l_extendedprice, 0.9), 2) AS p90_price,
           count(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "f7_array_battery" ->
      """WITH g AS (
           SELECT l_orderkey, list_sort(list(l_linenumber)) AS lns
           FROM lineitem GROUP BY l_orderkey)
         SELECT l_orderkey, len(lns) AS n_lines, lns[1] AS first_ln,
           array_to_string(lns, ',') AS lns_csv,
           array_to_string(list_slice(list_sort(lns, 'DESC'), 1, 3), ',') AS top3_csv,
           list_contains(lns, 7) AS has7
         FROM g ORDER BY l_orderkey""",
    "e9_gap_fill" ->
      """WITH ev AS (
           SELECT user_id, date_trunc('hour', ts) AS hour, value
           FROM events WHERE user_id < 50),
         h AS (SELECT user_id, hour, round(sum(value), 4) AS v
               FROM ev GROUP BY 1, 2),
         b AS (SELECT user_id, min(hour) AS h0, max(hour) AS h1
               FROM h GROUP BY 1),
         grid AS (SELECT user_id,
                    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
                  FROM b)
         SELECT g.user_id, g.hour,
           last_value(h.v IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill
         FROM grid g LEFT JOIN h ON h.user_id = g.user_id AND h.hour = g.hour
         ORDER BY g.user_id, g.hour""",
    "e10_funnel" ->
      """WITH a AS (SELECT user_id, ts AS ta, event_id FROM events
                    WHERE event_type = 'click'),
         b AS (SELECT user_id AS ub, ts AS tb FROM events
               WHERE event_type = 'purchase'),
         conv AS (
           SELECT user_id, count(*) AS n_conv FROM (
             SELECT DISTINCT a.user_id, a.event_id FROM a JOIN b
               ON a.user_id = b.ub AND b.tb >= a.ta
                  AND b.tb <= a.ta + INTERVAL 1 HOUR)
           GROUP BY user_id),
         clicks AS (SELECT user_id, count(*) AS n_clicks FROM a GROUP BY user_id)
         SELECT c.user_id, c.n_clicks, coalesce(v.n_conv, 0) AS n_conv
         FROM clicks c LEFT JOIN conv v USING (user_id)
         ORDER BY user_id""",
    "t9_stratified_split" ->
      """SELECT doc_id, lang FROM documents
         WHERE CASE WHEN lang = 'en'
                    THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4'
                    ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8' END
         ORDER BY doc_id""",
    "v2_vector_quantize" ->
      """WITH v AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
         m AS (
           SELECT vec_id, ev,
             list_aggregate(ev, 'min') AS vmin,
             list_aggregate(ev, 'max') AS vmax,
             (list_aggregate(ev, 'max') - list_aggregate(ev, 'min')) / 255.0 AS scale
           FROM v),
         q AS (
           SELECT vec_id, ev, vmin, vmax, scale,
             list_transform(ev, x -> CASE WHEN scale = 0 THEN 0
               ELSE CAST(round((x - vmin) / scale, 0) AS BIGINT) END) AS qs
           FROM m),
         dq AS (
           SELECT vec_id, ev, vmin, vmax, qs,
             list_transform(qs, qi -> vmin + qi * scale) AS dqs
           FROM q)
         SELECT vec_id, round(vmin, 4) AS vmin, round(vmax, 4) AS vmax,
           list_reduce(list_prepend(0::BIGINT, qs), (x, y) -> x + y) AS q_sum,
           round(sqrt(list_reduce(list_prepend(0.0,
             list_transform(range(1, len(ev)+1), i ->
               (ev[i] - dqs[i]) * (ev[i] - dqs[i]))), (x, y) -> x + y) / 64.0), 6) AS rmse
         FROM dq ORDER BY vec_id""",
    "j9_triangles" ->
      """WITH li AS (
           SELECT l_orderkey, l_partkey FROM lineitem WHERE l_linenumber <= 5),
         e AS (
           SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
           FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
                              AND x.l_partkey < y.l_partkey)
         SELECT count(*) AS n_triangles
         FROM e e1
         JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
         JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b"""
  )
}
