package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.llm.Similarity
import graft.queries.OracleSql.{cosExact, dotFold}

/** Round-4 surface extensions, batch 17: kNN classification over the
  * embedding corpus, Matryoshka (prefix-dimension) ANN, per-source Zipf
  * exponent fitting, and a KMV distinct-count sketch — each with a DuckDB
  * oracle.
  */
object Extended17 {
  type Q = (SparkSession, String) => DataFrame

  /** Drop a managed table AND its warehouse directory: the in-memory
    * catalog is per-session but the directory outlives the JVM, and
    * saveAsTable refuses a location it didn't create
    * (LOCATION_ALREADY_EXISTS).
    */
  private[queries] def dropBucketTable(s: SparkSession, name: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $name")
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(wh, name)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
  }

  val queries: Map[String, Q] = Map(
    // ---- kNN classification: majority label of the 5 nearest neighbors ----
    // The label column makes the embeddings table a labeled corpus; the
    // query classifies vectors 0-9 against the rest. Selection ranks by
    // EXACT cosine (ascending-index fold both engines), majority vote
    // tie-breaks (count desc, label asc) — fully deterministic. The
    // broadcast query side keeps the scan one codegen pass; at corpus
    // scale the same plan runs per-batch with the kNN-join operator.
    // Top-5 goes through the bounded-heap GroupTopK physical op (as j11
    // does): the shuffle carries at most 5 rows per query per map
    // partition, vs the window form's full sort of every scored pair. The
    // vote is a partial-aggregable min(struct) argmax — no window at all.
    "g9_knn_classify" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("qv"))
      val v = e.filter(col("vec_id") >= 10)
        .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("ev"))
      val scored = v.crossJoin(broadcast(q))
        .select(col("qid"), col("vec_id"), col("label"),
          Similarity.cosine(col("ev"), col("qv")).as("sim"))
      val top5 = graft.plans.GroupTopK.topK(
        scored, Seq("qid"), Seq(("sim", false), ("vec_id", true)), 5)
      top5.groupBy("qid", "label").agg(count(lit(1)).as("c"))
        .groupBy("qid")
        .agg(min(struct((-col("c")).as("nc"), col("label"))).as("m"))
        .select(col("qid"), col("m.label").as("pred"))
        .orderBy("qid")
    }),

    // ---- Matryoshka ANN: search on a 16-dim prefix of the embedding ----
    // Prefix-truncation search (the Matryoshka representation trick):
    // cosine is scale-invariant, so no re-normalization is needed — the
    // scan reads 1/4 of the vector bytes and the same top-k plan applies.
    // At scale the prefix is a stored column and this is the cheap first
    // pass before full-dimension re-rank.
    "v4_matryoshka_topk" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(slice(col("embedding").cast("array<double>"), 1, 16).as("qv"))
      e.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), slice(col("embedding").cast("array<double>"), 1, 16).as("ev"))
        .crossJoin(broadcast(q))
        .select(col("vec_id"), Similarity.cosine(col("ev"), col("qv")).as("simx"))
        .orderBy(col("simx").desc, col("vec_id"))
        .limit(10)
        .select(col("vec_id"), round(col("simx"), 4).as("sim"))
    }),

    // ---- Zipf exponent: ln(freq) ~ ln(rank) slope per source ----
    // Rank-frequency power-law fit over the top-100 term ranks — the
    // standard corpus-health diagnostic (natural text ≈ -1; the synthetic
    // corpus is flatter). regr_slope is a mergeable aggregate on both
    // engines (a16 pins the parity pattern); ranks are deterministic via
    // the (freq desc, term) tie-break.
    "t19_zipf_slope" -> ((s, d) => {
      val tf = t(s, d, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy("source", "term").agg(count(lit(1)).as("f"))
      tf.withColumn("r", row_number().over(
          Window.partitionBy("source").orderBy(col("f").desc, col("term"))))
        .filter(col("r") <= 100)
        .groupBy("source")
        .agg(round(regr_slope(log(col("f")), log(col("r"))), 6).as("zipf"),
          count(lit(1)).as("n_terms"))
        .orderBy("source")
    }),

    // ---- bucketed co-located join ----
    // Both sides written bucketBy(8) on the join key: the sort-merge join
    // reads bucket i against bucket i with NO shuffle exchange (PlanSpec
    // asserts the plan) — the physical-layout contract that makes repeated
    // fact-dimension joins at 100 TB one-scan operations. The oracle
    // checks the logical result; bucketing is invisible to it.
    "s11_bucketed_join" -> ((s, d) => {
      // the in-memory catalog forgets tables across sessions but the
      // warehouse directory persists — clear both so the write is
      // idempotent in any session. Table names are derived from the
      // dataset path so two concurrent runs over different SFs (or a
      // parallel bench sweep sharing a warehouse dir) can't race on a
      // shared table.
      val tag = java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(d) & 0xFFFFFFFFL)
      val custTbl = s"bkt_customer_$tag"
      val ordTbl = s"bkt_orders_$tag"
      dropBucketTable(s, custTbl)
      dropBucketTable(s, ordTbl)
      t(s, d, "customer").write.mode("overwrite").format("parquet")
        .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable(custTbl)
      t(s, d, "orders").write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable(ordTbl)
      s.table(custTbl)
        .join(s.table(ordTbl), col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy("c_mktsegment")
    }),

    // ---- KMV (k-minimum-values) distinct-count sketch ----
    // Estimate distinct parts per return flag from the 64 smallest
    // hash values: est = (k-1) · 2³² / h₍ₖ₎. The sketch state is k longs
    // per group — mergeable, bounded, the classic distributed
    // distinct-count compromise (vs a13's exact bitmap). md5 is the shared
    // engine-identical hash; the estimate is one double division.
    "a18_kmv_distinct" -> ((s, d) => {
      val hashed = t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_partkey")).distinct()
        .select(col("l_returnflag"),
          conv(substring(md5(col("l_partkey").cast("string")), 1, 8), 16, 10)
            .cast("long").as("hv"))
      hashed.withColumn("rk", row_number().over(
          Window.partitionBy("l_returnflag").orderBy("hv")))
        .filter(col("rk") <= 64)
        .groupBy("l_returnflag")
        .agg(max("hv").as("hk"), count(lit(1)).as("k"))
        .select(col("l_returnflag"), col("k"),
          round(when(col("k") < 64, col("k").cast("double"))
            .otherwise(lit(63.0) * lit(4294967296.0) / col("hk")), 4).as("est_distinct"))
        .orderBy("l_returnflag")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "g9_knn_classify" ->
      s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
                     FROM embeddings WHERE vec_id < 10),
         v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ev
               FROM embeddings WHERE vec_id >= 10),
         scored AS (SELECT qid, vec_id, label, ${cosExact("ev", "qv")} AS sim
                    FROM q CROSS JOIN v),
         top5 AS (SELECT * FROM scored
                  QUALIFY row_number() OVER (
                    PARTITION BY qid ORDER BY sim DESC, vec_id) <= 5),
         votes AS (SELECT qid, label, count(*) AS c FROM top5 GROUP BY qid, label)
         SELECT qid, label AS pred FROM votes
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY c DESC, label) = 1
         ORDER BY qid""",
    "v4_matryoshka_topk" ->
      s"""WITH q AS (SELECT (CAST(embedding AS DOUBLE[]))[1:16] AS qv
                     FROM embeddings WHERE vec_id = 0),
         v AS (SELECT vec_id, (CAST(embedding AS DOUBLE[]))[1:16] AS ev
               FROM embeddings WHERE vec_id <> 0)
         SELECT vec_id, round(${cosExact("ev", "qv")}, 4) AS sim
         FROM v CROSS JOIN q
         ORDER BY ${cosExact("ev", "qv")} DESC, vec_id LIMIT 10""",
    "t19_zipf_slope" ->
      """WITH toks AS (
           SELECT source, unnest(string_split(text, ' ')) AS term FROM documents),
         tf AS (SELECT source, term, count(*) AS f FROM toks
                WHERE len(term) > 0 GROUP BY 1, 2),
         ranked AS (
           SELECT source, f, row_number() OVER (
             PARTITION BY source ORDER BY f DESC, term) AS r
           FROM tf)
         SELECT source, round(regr_slope(ln(f), ln(r)), 6) AS zipf,
           count(*) AS n_terms
         FROM ranked WHERE r <= 100 GROUP BY source ORDER BY source""",
    "s11_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "a18_kmv_distinct" ->
      """WITH d AS (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem),
         h AS (SELECT l_returnflag,
                 CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8)) AS BIGINT) AS hv
               FROM d),
         r AS (SELECT l_returnflag, hv, row_number() OVER (
                 PARTITION BY l_returnflag ORDER BY hv) AS rk FROM h),
         kth AS (SELECT l_returnflag, max(hv) AS hk, count(*) AS k
                 FROM r WHERE rk <= 64 GROUP BY l_returnflag)
         SELECT l_returnflag, k,
           round(CASE WHEN k < 64 THEN CAST(k AS DOUBLE)
                      ELSE 63.0 * 4294967296.0 / hk END, 4) AS est_distinct
         FROM kth ORDER BY l_returnflag"""
  )
}
