package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.route.Bridges

/** Round-6 surface extensions, batch 43: the last two TPC-H join shapes
  * the lite schema can express, 2-edge-connected components, and exact
  * per-group mode.
  *
  *  - q23: TPC-H Q9 analog (product-type profit). The lite schema has no
  *    `ps_supplycost`, so unit cost is `p_retailprice` (the one per-part
  *    price measure): profit = Σ price·(1−disc) − retail·qty over
  *    '%gear%' parts, by supplier nation × order year. All money flows
  *    through the scaled-int discipline (price and (1−disc) at cent
  *    scale → 10⁻⁴ units; cost rescaled by 100 to the same unit;
  *    quantities integral), so the distributed sum is an exact BIGINT
  *    fold and the single final division is engine-identical. Plan: part
  *    (2k rows, filtered smaller) and supplier⋈nation broadcast into the
  *    lineitem scan; the only big-big join is lineitem⋈orders on the
  *    order key — the unavoidable one, keyed correctly for AQE.
  *  - q24: TPC-H Q8 analog (national market share): NATION_3's share of
  *    ECONOMY-part revenue sold to ASIA customers, per order year. The
  *    numerator/denominator are the same exact scaled-int sums (one
  *    conditional, one total — a single aggregation pass, not two
  *    queries); the share is one final division. customer⋈nation⋈region
  *    prune to ASIA before touching orders; part prunes to ECONOMY
  *    before touching lineitem.
  *  - j18: 2-EDGE-CONNECTED COMPONENTS
  *    ([[graft.route.Bridges.twoEdgeConnectedComponents]] — bridges
  *    anti-joined out, GraphX CC over the rest, min-member labels) on
  *    batch 42's sparse supernode graph: 127 nodes → a 101-node core +
  *    26 singletons at sf0.01 (every bridge endpoint severed). The
  *    oracle recomputes bridges by per-excluded-edge reachability and
  *    the components by recursive min-label closure — different
  *    algorithm, same invariant.
  *  - a21: exact MODE per group with a deterministic smallest-value
  *    tie-break, as one `max(struct(count, -value))` partial agg over
  *    (group, value) pre-counts — state ∝ distinct values per group
  *    (l_quantity: ≤ 50), never a value buffer, the same discipline as
  *    a19/a20.
  */
object Extended43 {
  type Q = (SparkSession, String) => DataFrame

  /** rev_scaled = round(price*100) * round((1-disc)*100): exact int64. */
  private def revScaled = (round(col("l_extendedprice") * 100).cast("long") *
    round((lit(1.0) - col("l_discount")) * 100).cast("long"))

  val queries: Map[String, Q] = Map(
    // ---- q23: TPC-H Q9 analog — profit by supplier nation × year ----
    "q23_product_profit" -> ((s, d) => {
      val gearParts = t(s, d, "part").filter(col("p_name").like("%gear%"))
        .select(col("p_partkey"),
          round(col("p_retailprice") * 100).cast("long").as("cost_scaled"))
      val suppNation = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      val li = t(s, d, "lineitem")
        .join(broadcast(gearParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_orderkey"), col("nation"),
          (revScaled - col("cost_scaled") * 100L *
            col("l_quantity").cast("long")).as("profit_scaled"))
      li.join(t(s, d, "orders").select(col("o_orderkey"),
          year(col("o_orderdate")).as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("nation", "o_year")
        .agg(round(sum(col("profit_scaled")).cast("double") / 10000.0, 2)
          .as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // ---- q24: TPC-H Q8 analog — NATION_3 share of ASIA ECONOMY revenue ----
    "q24_market_share" -> ((s, d) => {
      val asiaCust = t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val asiaOrders = t(s, d, "orders")
        .join(asiaCust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      val suppNation = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val econParts = t(s, d, "part").filter(col("p_type") === "ECONOMY")
        .select("p_partkey")
      val li = t(s, d, "lineitem")
        .join(broadcast(econParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_orderkey"), col("supp_nation"), revScaled.as("rs"))
      li.join(asiaOrders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_year")
        .agg(sum(when(col("supp_nation") === "NATION_3", col("rs"))
            .otherwise(0L)).as("nation_rev_scaled"),
          sum(col("rs")).as("total_rev_scaled"))
        .select(col("o_year"), col("nation_rev_scaled"), col("total_rev_scaled"),
          round(col("nation_rev_scaled").cast("double") /
            col("total_rev_scaled"), 4).as("mkt_share"))
        .orderBy("o_year")
    }),

    // ---- j18: 2-edge-connected components ----
    "j18_two_edge_components" -> ((s, d) =>
      Bridges.twoEdgeConnectedComponents(s,
          Extended42.sparseSupernodeEdges(s, d))
        .orderBy("node")),

    // ---- a21: exact per-group mode, smallest-value tie-break ----
    "a21_mode" -> ((s, d) => {
      val c = t(s, d, "lineitem")
        .groupBy(col("l_returnflag").as("flag"),
          col("l_quantity").cast("long").as("q"))
        .agg(count(lit(1)).as("n"))
      c.groupBy("flag")
        .agg(max(struct(col("n"), (-col("q")).as("negq"))).as("m"))
        .select(col("flag"), (-col("m.negq")).as("mode_qty"),
          col("m.n").as("mode_count"))
        .orderBy("flag")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q23_product_profit" ->
      """WITH pr AS (
           SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
             CAST(round(l.l_extendedprice * 100) AS BIGINT) *
             CAST(round((1.0 - l.l_discount) * 100) AS BIGINT)
             - CAST(round(p.p_retailprice * 100) AS BIGINT) * 100
               * CAST(l.l_quantity AS BIGINT) AS profit_scaled
           FROM lineitem l
           JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%gear%'
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           JOIN nation n ON s.s_nationkey = n.n_nationkey
           JOIN orders o ON l.l_orderkey = o.o_orderkey)
         SELECT nation, o_year,
           round(CAST(sum(profit_scaled) AS DOUBLE) / 10000.0, 2) AS sum_profit
         FROM pr GROUP BY nation, o_year ORDER BY nation, o_year DESC""",
    "q24_market_share" ->
      """WITH rev AS (
           SELECT year(o.o_orderdate) AS o_year,
             CAST(round(l.l_extendedprice * 100) AS BIGINT) *
             CAST(round((1.0 - l.l_discount) * 100) AS BIGINT) AS rs,
             sn.n_name AS supp_nation
           FROM lineitem l
           JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation cn ON c.c_nationkey = cn.n_nationkey
           JOIN region r ON cn.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           JOIN nation sn ON s.s_nationkey = sn.n_nationkey)
         SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rs ELSE 0 END)
             AS BIGINT) AS nation_rev_scaled,
           CAST(sum(rs) AS BIGINT) AS total_rev_scaled,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rs ELSE 0 END)
             AS DOUBLE) / sum(rs), 4) AS mkt_share
         FROM rev GROUP BY o_year ORDER BY o_year""",
    "j18_two_edge_components" ->
      """WITH RECURSIVE edges AS (
           SELECT least(o_custkey % 128, o_orderkey % 128) AS u,
                  greatest(o_custkey % 128, o_orderkey % 128) AS v
           FROM orders
           WHERE o_orderkey % 89 = 0 AND o_custkey % 128 <> o_orderkey % 128
           GROUP BY 1, 2),
         eid AS (SELECT row_number() OVER (ORDER BY u, v) AS id, u, v FROM edges),
         bidir AS (SELECT id, u AS a, v AS b FROM eid
                   UNION ALL SELECT id, v, u FROM eid),
         reach AS (
           SELECT id AS ex, u AS node FROM eid
           UNION
           SELECT r.ex, b.b AS node
           FROM reach r JOIN bidir b ON b.a = r.node AND b.id <> r.ex),
         nb AS (
           SELECT e.u, e.v FROM eid e
           WHERE EXISTS (SELECT 1 FROM reach r WHERE r.ex = e.id AND r.node = e.v)),
         nodes AS (SELECT u AS node FROM edges UNION SELECT v FROM edges),
         sym AS (SELECT u AS a, v AS b FROM nb UNION ALL SELECT v AS a, u AS b FROM nb),
         rr AS (
           SELECT node, node AS m FROM nodes
           UNION
           SELECT s.b AS node, rr.m FROM rr JOIN sym s ON s.a = rr.node)
         SELECT node, min(m) AS comp FROM rr GROUP BY node ORDER BY node""",
    "a21_mode" ->
      """WITH c AS (SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS q,
                  count(*) AS n
           FROM lineitem GROUP BY 1, 2)
         SELECT flag, q AS mode_qty, n AS mode_count
         FROM c QUALIFY row_number() OVER (PARTITION BY flag ORDER BY n DESC, q) = 1
         ORDER BY flag"""
  )
}
