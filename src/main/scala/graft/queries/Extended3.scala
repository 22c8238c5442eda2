package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.TopKAgg

/** Round-2 surface extensions, batch 3: SCD-type-2 interval building,
  * generator (explode family) battery, a typed bounded top-k UDAF,
  * CSV/JSON source-sink round-trip, and GraphX connected components over
  * per-customer order chains — each with a bit-exact DuckDB oracle.
  */
object Extended3 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- SCD2: collapse an event log into effective-dated type intervals ----
    "e11_scd2" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val changes = t(s, d, "events")
        .withColumn("pe", lag("event_type", 1).over(w))
        .filter(col("pe").isNull || col("pe") =!= col("event_type"))
      changes.select(col("event_id"), col("user_id"), col("event_type"),
          col("ts").as("valid_from"),
          lead("ts", 1).over(w).as("valid_to"))
        .orderBy("event_id")
    }),

    // ---- generator battery: ordinal explode of per-group arrays ----
    "f8_generator_battery" -> ((s, d) =>
      t(s, d, "lineitem").groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("l_linenumber"))).as("lns"))
        .select(col("l_orderkey"), posexplode(col("lns")).as(Seq("pos", "ln")))
        .orderBy("l_orderkey", "pos")),

    // ---- typed UDAF: bounded top-k per group (O(k) buffer, partial-agg safe) ----
    "a11_topk_udaf" -> ((s, d) => {
      val top3 = udaf(new TopKAgg(3), org.apache.spark.sql.Encoders.product[(Double, Long)])
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(top3(col("l_extendedprice"), col("l_orderkey")).as("top3"))
        .orderBy("l_returnflag")
    }),

    // ---- CSV + JSON sink/source round-trip (schema-applied re-read) ----
    "s7_format_roundtrip" -> ((s, d) => {
      val dir = Scratch.dir("s7", d)
      val li = t(s, d, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_quantity", "l_linenumber")
      li.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
      li.write.mode("overwrite").json(s"$dir/json")
      val csv = s.read.option("header", "true").schema(li.schema).csv(s"$dir/csv")
      val jsn = s.read.schema(li.schema).json(s"$dir/json")
      // quantities are integer-valued, so the double sums are exact and the
      // text round-trip cannot perturb them
      csv.unionByName(jsn).groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum("l_quantity").cast("long").as("sum_qty"),
          sum("l_linenumber").as("sum_ln"))
        .orderBy("l_returnflag")
    }),

    // ---- partitioned sink + partition-pruned read ----
    // The 100 TB sink pattern: write date-partitioned, read one partition.
    // The re-read scan must show PartitionFilters (proved in
    // Extended3Spec via inputFiles), not a full-table scan + filter.
    "s8_partition_prune" -> ((s, d) => {
      val dir = Scratch.dir("s8", d)
      val ev = t(s, d, "events").withColumn("day", to_date(col("ts")))
      // shuffle by the partition column first: without it every input task
      // writes a file into every day directory (tasks × days tiny files —
      // the classic small-files failure at scale); with it, one file per day
      ev.repartition(col("day")).write.mode("overwrite").partitionBy("day").parquet(dir)
      val firstDay = ev.agg(min("day")).head.getDate(0)
      s.read.parquet(dir).filter(col("day") === lit(firstDay))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .orderBy("event_type")
    }),

    // ---- SQL surface: correlated scalar / EXISTS / IN subqueries ----
    // Catalyst decorrelates these into aggregated + semi joins; the point
    // is that the SQL front door accepts the full subquery family.
    "q2_subquery_battery" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("v_orders")
      t(s, d, "lineitem").createOrReplaceTempView("v_lineitem")
      t(s, d, "customer").createOrReplaceTempView("v_customer")
      s.sql("""
        SELECT o.o_orderkey,
          (SELECT CAST(sum(l.l_quantity) AS BIGINT) FROM v_lineitem l
            WHERE l.l_orderkey = o.o_orderkey) AS qty,
          EXISTS (SELECT 1 FROM v_lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45) AS has_big_line,
          o.o_custkey IN (SELECT c_custkey FROM v_customer WHERE c_acctbal > 5000) AS rich_cust
        FROM v_orders o ORDER BY o.o_orderkey""")
    }),

    // ---- SQL surface: LATERAL correlated derived table ----
    "q3_lateral_join" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("v_orders")
      t(s, d, "lineitem").createOrReplaceTempView("v_lineitem")
      s.sql("""
        SELECT o.o_orderkey, l.maxq, l.nl
        FROM v_orders o,
          LATERAL (SELECT max(l_quantity) AS maxq, count(*) AS nl
                   FROM v_lineitem WHERE l_orderkey = o.o_orderkey) l
        ORDER BY o.o_orderkey""")
    }),

    // ---- custom physical plan: bounded-heap per-group top-k ----
    // GroupTopK plans as partial -> one hash exchange -> final (see
    // GroupTopKSpec): the shuffle carries at most groups x k rows per map
    // partition instead of the whole table, unlike the row_number() window
    // form the oracle uses.
    "w7_group_topk" -> ((s, d) =>
      graft.plans.GroupTopK.topK(t(s, d, "lineitem"), Seq("l_returnflag"),
          Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), 3)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_returnflag", "l_orderkey", "l_linenumber")),

    // ---- GraphX connected components over per-customer order trees ----
    // Balanced binary-tree edges (order j → order (j-1)/2 in sorted
    // position) force multi-hop label propagation — the component id still
    // travels tree depth ≈ log₂(orders-per-customer) hops, exercising the
    // iterative Pregel path rather than a single hash-agg — while keeping
    // the component diameter (and so the CC iteration count) logarithmic
    // instead of linear in chain length. Same vertex set and components as
    // a chain; the oracle states the fixpoint (min orderkey per customer)
    // directly.
    "j10_connected_components" -> ((s, d) => {
      import s.implicits._
      val ed = t(s, d, "orders").select("o_custkey", "o_orderkey")
        .groupBy("o_custkey").agg(sort_array(collect_list("o_orderkey")).as("ks"))
        .select(explode(expr(
          "transform(slice(ks, 2, size(ks)), (x, i) -> struct(x AS a, ks[i div 2] AS b))")).as("e"))
        .select("e.a", "e.b")
      // min-label CC via FastCC's forest contraction (2 jobs, no Pregel
      // supersteps; GraphX fallback above the gate) — identical labels,
      // checkpoint-materialized so no RDD cache outlives the call
      val labels = graft.graph.FastCC.labels(
        ed.select("a", "b"), "o_orderkey", "component")
      labels.orderBy("o_orderkey")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "e11_scd2" ->
      """WITH ch AS (
           SELECT * FROM (
             SELECT event_id, user_id, event_type, ts,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pe
             FROM events)
           WHERE pe IS NULL OR pe <> event_type)
         SELECT event_id, user_id, event_type, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
         FROM ch ORDER BY event_id""",
    "f8_generator_battery" ->
      """WITH g AS (
           SELECT l_orderkey, list_sort(list(l_linenumber)) AS lns
           FROM lineitem GROUP BY l_orderkey),
         u AS (
           SELECT l_orderkey, unnest(list_zip(range(1, len(lns) + 1), lns)) AS z
           FROM g)
         SELECT l_orderkey, z[1] - 1 AS pos, z[2] AS ln
         FROM u ORDER BY l_orderkey, pos""",
    "a11_topk_udaf" ->
      """WITH r AS (
           SELECT l_returnflag, l_orderkey,
             row_number() OVER (PARTITION BY l_returnflag
               ORDER BY l_extendedprice DESC, l_orderkey) AS rn
           FROM lineitem)
         SELECT l_returnflag,
           array_to_string(list(l_orderkey ORDER BY rn), ',') AS top3
         FROM r WHERE rn <= 3 GROUP BY l_returnflag ORDER BY l_returnflag""",
    "s7_format_roundtrip" ->
      """SELECT l_returnflag, 2 * count(*) AS n,
           CAST(2 * sum(l_quantity) AS BIGINT) AS sum_qty,
           CAST(2 * sum(l_linenumber) AS BIGINT) AS sum_ln
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "s8_partition_prune" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
         FROM events
         WHERE CAST(ts AS DATE) = (SELECT min(CAST(ts AS DATE)) FROM events)
         GROUP BY event_type ORDER BY event_type""",
    "q2_subquery_battery" ->
      """SELECT o.o_orderkey,
           (SELECT CAST(sum(l.l_quantity) AS BIGINT) FROM lineitem l
             WHERE l.l_orderkey = o.o_orderkey) AS qty,
           EXISTS (SELECT 1 FROM lineitem l
             WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45) AS has_big_line,
           o.o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000) AS rich_cust
         FROM orders o ORDER BY o.o_orderkey""",
    "q3_lateral_join" ->
      """SELECT o.o_orderkey, l.maxq, l.nl
         FROM orders o,
           LATERAL (SELECT max(l_quantity) AS maxq, count(*) AS nl
                    FROM lineitem WHERE l_orderkey = o.o_orderkey) l
         ORDER BY o.o_orderkey""",
    "w7_group_topk" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice
         FROM (
           SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
           FROM lineitem)
         WHERE rn <= 3
         ORDER BY l_returnflag, l_orderkey, l_linenumber""",
    "j10_connected_components" ->
      """WITH c AS (
           SELECT o_custkey, count(*) AS n, min(o_orderkey) AS mn
           FROM orders GROUP BY o_custkey)
         SELECT o_orderkey, c.mn AS component
         FROM orders o JOIN c ON o.o_custkey = c.o_custkey
         WHERE c.n >= 2 ORDER BY o_orderkey"""
  )
}
