package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-6 surface extensions, batch 31: the last TPC-H shapes — Q2, Q16,
  * Q20 and Q21 analogs. The lite schema has no partsupp, so the supply
  * relation is derived from fact history: `SELECT DISTINCT l_partkey,
  * l_suppkey FROM lineitem` (who actually shipped the part). With that,
  * every TPC-H query shape the data can express is covered (Q11 needs
  * supplycost values and stays out of reach by data).
  *
  * Scale notes (100 TB): the ersatz partsupp is one dedup shuffle keyed
  * on the (part, supp) pair — at scale it would be a maintained bucketed
  * table, same plan either way. q2b's per-part argmax is a single
  * max(struct) partial aggregation (no window over the fact side); q16
  * is partial-distinct per group; q20 is one conditional aggregation per
  * supplier; q21's "sole late supplier" meets per-(order, supplier)
  * partials with a per-order rollup — two key-local shuffles, no
  * correlated per-row probing.
  */
object Extended31 {
  type Q = (SparkSession, String) => DataFrame

  /** Who has ever shipped the part — the supply relation Q2/Q16/Q20
    * assume. One distinct over (partkey, suppkey).
    */
  private def partSupp(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").select(col("l_partkey"), col("l_suppkey")).distinct()

  val queries: Map[String, Q] = Map(
    // ---- TPC-H Q2 analog: best supplier per European size-15 part ----
    // Q2's min-cost supplier becomes max-balance supplier (s_acctbal is
    // the only supplier measure in the lite schema), ties to the lowest
    // suppkey. argmax via ONE max(struct(bal, -suppkey)) partial agg —
    // exact on scaled-cent balances, no per-part subquery, no window.
    "q2b_best_supplier" -> ((s, d) => {
      val europe = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"),
          round(col("s_acctbal") * 100).cast("long").as("bal_scaled"))
      val parts = t(s, d, "part").filter(col("p_size") === 15)
        .select("p_partkey", "p_name")
      val best = partSupp(s, d)
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(europe), col("l_suppkey") === col("s_suppkey"))
        .groupBy("p_partkey", "p_name")
        .agg(max(struct(col("bal_scaled"), (-col("s_suppkey")).as("neg_supp")))
          .as("m"))
        .select(col("p_partkey"), col("p_name"),
          col("m.bal_scaled").as("bal_scaled"),
          (-col("m.neg_supp")).as("s_suppkey"))
      best.join(broadcast(europe.select(col("s_suppkey").as("sk"),
          col("s_name"), col("n_name"))), col("s_suppkey") === col("sk"))
        .select(round(col("bal_scaled").cast("double") / 100.0, 2).as("s_acctbal"),
          col("s_name"), col("n_name"), col("p_partkey"), col("p_name"))
        .orderBy(col("s_acctbal").desc, col("p_partkey"))
        .limit(20)
    }),

    // ---- TPC-H Q16: supplier count per (brand, type, size) ----
    "q16_supplier_cnt" -> ((s, d) => {
      val p = t(s, d, "part")
        .filter(col("p_brand") =!= "Brand#4" &&
          col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      partSupp(s, d).join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // ---- TPC-H Q20 analog: promo-specialist suppliers ----
    // Q20 finds suppliers holding excess stock of a part family; without
    // partsupp availqty the analog is suppliers whose shipped PROMO
    // volume exceeds a sixth of their total volume (PROMO is one of six
    // uniform p_type values, so this is "above-average promo affinity";
    // >50% would be vacuous on this data). Integer quantity sums —
    // exact comparison, single conditional aggregation per supplier.
    "q20_promo_share" -> ((s, d) => {
      val li = t(s, d, "lineitem").select("l_suppkey", "l_partkey", "l_quantity")
      val p = t(s, d, "part").select("p_partkey", "p_type")
      val per = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(sum(col("l_quantity").cast("long")).as("total_qty"),
          sum(when(col("p_type") === "PROMO", col("l_quantity").cast("long"))
            .otherwise(0L)).as("promo_qty"))
        .filter(col("promo_qty") * 6 > col("total_qty"))
      per.join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("promo_qty"),
          col("total_qty"))
        .orderBy("s_suppkey")
    }),

    // ---- TPC-H Q21 analog: the sole late supplier of multi-supplier orders ----
    // Late = shipped more than 60 days after the order date. Per-(order,
    // supplier) partials first (was this supplier late on this order?),
    // then a per-order rollup (how many suppliers, how many late) — the
    // EXISTS / NOT EXISTS pair of real Q21 as two aggregation levels
    // instead of two correlated probes.
    "q21_sole_late" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
            .as("late"))
      // perOS feeds BOTH the per-order rollup and the culprit probe —
      // materialize the fact-join+aggregate once instead of twice; the
      // qualifying-order set is then small and selective (n_supp ≥ 2 with
      // EXACTLY one late supplier), so the culprit join broadcasts it
      // instead of sort-merging the full per-(order,supplier) relation
      val perOS = li.groupBy("l_orderkey", "l_suppkey")
        .agg(max(col("late")).as("supp_late"))
        .localCheckpoint()
      val perO = perOS.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_supp"),
          count_if(col("supp_late")).as("n_late"))
        .filter(col("n_supp") >= 2 && col("n_late") === 1)
      val culprits = perOS.filter(col("supp_late"))
        .join(broadcast(perO.select("l_orderkey")), "l_orderkey")
      culprits.groupBy("l_suppkey").agg(count(lit(1)).as("numwait"))
        .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("s_suppkey"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
        .limit(20)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q2b_best_supplier" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         eu AS (
           SELECT s_suppkey, s_name, n_name,
             CAST(round(s_acctbal * 100) AS BIGINT) AS bal_scaled
           FROM supplier
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'EUROPE'),
         best AS (
           SELECT p_partkey, p_name, bal_scaled, s_suppkey, s_name, n_name,
             row_number() OVER (PARTITION BY p_partkey
               ORDER BY bal_scaled DESC, s_suppkey) AS rn
           FROM ps
           JOIN part ON l_partkey = p_partkey AND p_size = 15
           JOIN eu ON l_suppkey = s_suppkey)
         SELECT round(CAST(bal_scaled AS DOUBLE) / 100.0, 2) AS s_acctbal,
           s_name, n_name, p_partkey, p_name
         FROM best WHERE rn = 1
         ORDER BY s_acctbal DESC, p_partkey LIMIT 20""",
    "q16_supplier_cnt" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
         SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
         FROM ps JOIN part ON l_partkey = p_partkey
         WHERE p_brand <> 'Brand#4'
           AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
         GROUP BY p_brand, p_type, p_size
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    "q20_promo_share" ->
      """WITH per AS (
           SELECT l_suppkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
             CAST(sum(CASE WHEN p_type = 'PROMO'
               THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS promo_qty
           FROM lineitem JOIN part ON l_partkey = p_partkey
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, promo_qty, total_qty
         FROM per JOIN supplier ON l_suppkey = s_suppkey
         WHERE promo_qty * 6 > total_qty
         ORDER BY s_suppkey""",
    "q21_sole_late" ->
      """WITH li AS (
           SELECT l_orderkey, l_suppkey,
             l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE o_orderstatus = 'F'),
         per_os AS (
           SELECT l_orderkey, l_suppkey, max(late) AS supp_late
           FROM li GROUP BY l_orderkey, l_suppkey),
         per_o AS (
           SELECT l_orderkey FROM per_os GROUP BY l_orderkey
           HAVING count(*) >= 2 AND count_if(supp_late) = 1)
         SELECT s_name, s_suppkey, count(*) AS numwait
         FROM per_os
         JOIN per_o USING (l_orderkey)
         JOIN supplier ON l_suppkey = s_suppkey
         WHERE supp_late
         GROUP BY s_name, s_suppkey
         ORDER BY numwait DESC, s_suppkey LIMIT 20"""
  )
}
