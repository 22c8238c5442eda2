package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-6 surface extensions, batch 20: the training-data shaping layer —
  * the operators that sit between a filtered corpus and the trainer's data
  * loader. Sequence packing (concat-and-split into fixed-size training
  * windows), n-gram LM familiarity scoring (corpus-frequency quality
  * signal), incremental new-batch-vs-base dedup, deterministic epoch
  * sharding/shuffling, and exact proportional domain mixing — plus GraphX
  * strongly connected components under a closed-form recursive-CTE oracle
  * (the one classic graph fixpoint the surface did not yet gate).
  *
  * Scale notes are inline per query; the common theme is that every global
  * ordering is reduced to either (a) per-shard/per-group windows after a
  * hash or range redistribution, or (b) a P-row relation of partition
  * aggregates — never a single-partition window over row-level data.
  */
object Extended20 {
  type Q = (SparkSession, String) => DataFrame

  /** Training-sequence capacity (tokens) for tp1. */
  private val SeqCap = 256

  val queries: Map[String, Q] = Map(
    // ---- tp1: sequence packing (concat-and-split) ----
    // The standard LLM pretraining layout: concatenate all documents in a
    // deterministic order and cut the token stream at fixed boundaries, so
    // every training sequence is exactly full (no padding waste; docs may
    // span a boundary). The only global state is each document's absolute
    // start offset — a prefix sum. A window over a global ORDER BY would
    // collapse to one partition, so the prefix sum is computed
    // distributed: contiguous deterministic buckets by doc_id range →
    // per-bucket window cumsum (parallel) + a bucket-offset relation of P
    // rows (the only partitionless window, over P=32 aggregate rows — at
    // 1000 executors P scales with the cluster, not the data).
    "tp1_sequence_pack" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("len"))
      val maxId = docs.agg(max("doc_id")).head.getLong(0)
      val width = maxId / 32 + 1
      val bucketed = docs.withColumn("b", expr(s"doc_id div $width"))
      val local = bucketed.withColumn("lend",
        sum("len").over(Window.partitionBy("b").orderBy("doc_id")))
      // P-row relation: per-bucket totals, exclusive running offset
      val offs = local.groupBy("b").agg(max("lend").as("bsum"))
        .withColumn("off", coalesce(sum("bsum").over(
          Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .select("b", "off")
      val spans = local.join(broadcast(offs), "b")
        .select(col("doc_id"),
          (col("off") + col("lend") - col("len")).as("st"),
          (col("off") + col("lend")).as("en"))
      // a doc occupies sequences floor(st/C) .. floor((en-1)/C); its token
      // contribution to each is the overlap of [st,en) with the sequence
      val seqs = spans.select(col("doc_id"), col("st"), col("en"),
        explode(sequence(expr(s"st div $SeqCap"), expr(s"(en - 1) div $SeqCap")))
          .as("seq_id"))
      seqs.groupBy("seq_id").agg(
          count(lit(1)).as("n_docs"),
          sum(least(col("en"), (col("seq_id") + 1) * SeqCap) -
            greatest(col("st"), col("seq_id") * SeqCap)).as("n_tokens"),
          min("doc_id").as("first_doc"))
        .orderBy("seq_id")
    }),

    // ---- tp2: bigram-LM familiarity (quality signal) ----
    // The empirical-frequency form of an n-gram LM score: a document whose
    // bigrams are common in the corpus is "familiar" (in-distribution);
    // one dominated by corpus-unique (hapax) bigrams is an outlier. All
    // aggregates are exact integer sums with a single terminal division,
    // so the score is bit-identical cross-engine (logs would not be: libm
    // vs JDK transcendentals differ in the last ulp). Bigrams are built
    // map-side with transform() (no window); the count join co-partitions
    // both sides on the bigram key, and AQE's skew split handles the
    // stop-bigram skew at scale.
    "tp2_lm_familiarity" -> ((s, d) => {
      val toks = t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 2)
      val bi = toks.select(col("doc_id"), explode(expr(
          "transform(slice(ws, 1, size(ws) - 1), (x, i) -> struct(x AS w1, ws[i + 1] AS w2))"))
          .as("g"))
        .select(col("doc_id"), col("g.w1"), col("g.w2"))
      val counts = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      bi.join(counts, Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum("c12").as("mass"),
          sum(when(col("c12") === 1, 1L).otherwise(0L)).as("hapax"))
        .select(col("doc_id"), col("n_bigrams"),
          round(col("mass").cast("double") / col("n_bigrams"), 4).as("familiarity"),
          round(col("hapax").cast("double") / col("n_bigrams"), 4).as("hapax_rate"))
        .orderBy("doc_id")
    }),

    // ---- tp3: incremental corpus dedup (new batch vs base) ----
    // The steady-state dedup shape: the corpus already exists; a new
    // ingest batch must be checked against it AND against itself, without
    // re-deduplicating the base. The fingerprint is the normalized
    // content key (word-order- and repetition-insensitive: the sorted
    // distinct-word set) — the usual "canonicalize, then hash" exact-dup
    // key that catches shuffled boilerplate raw md5 misses. Both checks
    // are fingerprint equi-joins that co-partition on the fingerprint —
    // the base side is never collected or broadcast (at 100 TB it is the
    // big side).
    "tp3_incremental_dedup" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"),
          md5(concat_ws(" ",
            array_sort(array_distinct(split(col("text"), " ")))).cast("binary"))
            .as("fp"))
      val base = docs.filter(col("doc_id") % 10 < 8).select("fp").distinct()
      val batch = docs.filter(col("doc_id") % 10 >= 8)
      val keeper = batch.groupBy("fp").agg(min("doc_id").as("keep_id"))
      batch.join(base.withColumn("in_base", lit(1)), Seq("fp"), "left")
        .join(keeper, Seq("fp"))
        .select(col("doc_id"),
          when(col("in_base") === 1, "dup_of_base")
            .when(col("doc_id") > col("keep_id"), "dup_in_batch")
            .otherwise("new").as("status"))
        .orderBy("doc_id")
    }),

    // ---- tp4: deterministic epoch shard shuffle ----
    // Training-order shuffling that is reproducible across runs, engines,
    // and partitionings: shard = first hex digit of a seeded key hash (16
    // shards), position = rank of the full hash within the shard. No
    // global row_number — the only windows are per-shard, i.e. the
    // redistribution IS the shuffle the data loader wants.
    "tp4_shard_shuffle" -> ((s, d) => {
      val h = md5(concat(lit("ep7:"), col("doc_id").cast("string")).cast("binary"))
      t(s, d, "documents").select(col("doc_id"), h.as("h"))
        .select(col("doc_id"), substring(col("h"), 1, 1).as("shard"), col("h"))
        .withColumn("pos",
          row_number().over(Window.partitionBy("shard").orderBy("h", "doc_id")))
        .select("doc_id", "shard", "pos")
        .orderBy("doc_id")
    }),

    // ---- tp5: exact proportional domain mixing ----
    // Deterministic per-domain quota sampling (the mixture step of a
    // training-data recipe): each source contributes its k
    // lowest-hash documents. The per-group top-k rides the bounded-heap
    // GroupTopK physical operator (not a window sort): the shuffle carries
    // at most k rows per source per map partition regardless of corpus
    // size. Weighted recipes are per-weight invocations of the same plan.
    "tp5_domain_mix" -> ((s, d) => {
      val ranked = t(s, d, "documents").select(col("doc_id"), col("source"),
        md5(col("doc_id").cast("string").cast("binary")).as("h"))
      graft.plans.GroupTopK.topK(ranked,
          Seq("source"), Seq(("h", true), ("doc_id", true)), 20)
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
    }),

    // ---- r3: strongly connected components (GraphX) ----
    // The remaining classic graph fixpoint, gated the batch-19 way: build
    // a topology with a closed-form answer FROM the driver's tables and
    // let the general distributed operator face an exact restatement. The
    // affine map u → (95·u + 5) mod 311 is a permutation whose cycle
    // structure is 31 ten-cycles plus one fixed point (ord(95) = 10 mod
    // 311), so SCC min-label propagation converges in ~10 supersteps; at
    // partial scales (fewer than 311 residues present) edges into missing
    // nodes are dropped and broken cycles decay to singletons — which the
    // oracle's mutual-reachability fixpoint reproduces verbatim.
    "r3_scc" -> ((s, d) => {
      val nodes = t(s, d, "customer")
        .select((col("c_custkey") % 311).as("u")).distinct()
      val edges = nodes.select(col("u"), ((col("u") * 95 + 5) % 311).as("v"))
        .join(nodes.select(col("u").as("v")), Seq("v"), "left_semi")
      // gated dispatch: driver Tarjan here (311 nodes), GraphX
      // min-label propagation past Route.LocalPathMaxEdges
      val scc = graft.route.Components.scc(s, nodes, edges.select("u", "v"))
      val sizes = scc.groupBy("scc_id").agg(count(lit(1)).as("scc_size"))
      scc.join(sizes, "scc_id")
        .select(col("node"), col("scc_id"), col("scc_size"))
        .orderBy("node")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "tp1_sequence_pack" ->
      s"""WITH d AS (
           SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS len
           FROM documents),
         c AS (
           SELECT doc_id, len,
             CAST(sum(len) OVER (ORDER BY doc_id) - len AS BIGINT) AS st
           FROM d),
         x AS (
           SELECT doc_id, st, st + len AS en,
             unnest(generate_series(st // $SeqCap, (st + len - 1) // $SeqCap)) AS seq_id
           FROM c)
         SELECT seq_id, count(*) AS n_docs,
           CAST(sum(least(en, (seq_id + 1) * $SeqCap) -
                    greatest(st, seq_id * $SeqCap)) AS BIGINT) AS n_tokens,
           min(doc_id) AS first_doc
         FROM x GROUP BY seq_id ORDER BY seq_id""",
    "tp2_lm_familiarity" ->
      """WITH w AS (
           SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         b AS (
           SELECT doc_id,
             unnest([ws[i] || ' ' || ws[i+1] FOR i IN range(1, len(ws))]) AS gram
           FROM w WHERE len(ws) >= 2),
         c AS (SELECT gram, count(*) AS c12 FROM b GROUP BY gram)
         SELECT doc_id, count(*) AS n_bigrams,
           round(CAST(sum(c12) AS DOUBLE) / count(*), 4) AS familiarity,
           round(CAST(sum(CASE WHEN c12 = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 4) AS hapax_rate
         FROM b JOIN c USING (gram)
         GROUP BY doc_id ORDER BY doc_id""",
    "tp3_incremental_dedup" ->
      """WITH f AS (
           SELECT doc_id,
             md5(array_to_string(
               list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
           FROM documents),
         base AS (SELECT DISTINCT fp FROM f WHERE doc_id % 10 < 8),
         batch AS (SELECT doc_id, fp FROM f WHERE doc_id % 10 >= 8),
         k AS (SELECT fp, min(doc_id) AS keep_id FROM batch GROUP BY fp)
         SELECT b.doc_id,
           CASE WHEN b.fp IN (SELECT fp FROM base) THEN 'dup_of_base'
                WHEN b.doc_id > k.keep_id THEN 'dup_in_batch'
                ELSE 'new' END AS status
         FROM batch b JOIN k ON b.fp = k.fp ORDER BY b.doc_id""",
    "tp4_shard_shuffle" ->
      """WITH h AS (
           SELECT doc_id, md5('ep7:' || CAST(doc_id AS VARCHAR)) AS h
           FROM documents)
         SELECT doc_id, substr(h, 1, 1) AS shard,
           CAST(row_number() OVER (
             PARTITION BY substr(h, 1, 1) ORDER BY h, doc_id) AS INT) AS pos
         FROM h ORDER BY doc_id""",
    "tp5_domain_mix" ->
      """SELECT source, doc_id FROM (
           SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
           FROM documents)
         WHERE rn <= 20 ORDER BY source, doc_id""",
    "r3_scc" ->
      """WITH RECURSIVE nodes AS (
           SELECT DISTINCT c_custkey % 311 AS u FROM customer),
         edges AS (
           SELECT u, (u * 95 + 5) % 311 AS v FROM nodes
           WHERE (u * 95 + 5) % 311 IN (SELECT u FROM nodes)),
         reach(src, cur) AS (
           SELECT u, u FROM nodes
           UNION
           SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.cur),
         mutual AS (
           SELECT r1.src AS u, r1.cur AS v
           FROM reach r1 JOIN reach r2 ON r1.src = r2.cur AND r1.cur = r2.src),
         scc AS (SELECT u, min(v) AS scc_id FROM mutual GROUP BY u),
         sizes AS (SELECT scc_id, count(*) AS scc_size FROM scc GROUP BY scc_id)
         SELECT scc.u AS node, scc.scc_id, sizes.scc_size
         FROM scc JOIN sizes USING (scc_id) ORDER BY node"""
  )
}
