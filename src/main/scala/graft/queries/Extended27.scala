package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.expressions.Window

import graft.Tables.t
import graft.operators.MergeInto
import graft.streaming.EventStream

/** Round-6 surface extensions, batch 27: relational MERGE (the
  * warehouse upsert statement, lowered to one full-outer join),
  * deterministic weighted sampling without replacement
  * (Efraimidis–Spirakis keys from a hash-derived uniform), and the
  * watermark LATE-DATA DROP itself under the oracle gate — not just
  * "streaming equals batch when nothing is late", but the exact rows a
  * 2-hour watermark discards on an out-of-order replay.
  */
object Extended27 {
  type Q = (SparkSession, String) => DataFrame

  /** Stage the event log as THREE wave files with pinned mtimes:
    * even-id rows, then the single newest odd row (by (ts, event_id)),
    * then every remaining odd row. Spark's late-record filter for batch
    * N uses the watermark computed after batch N−2 (eviction uses N−1 —
    * probed on 4.1.2), so a two-wave replay NEVER drops anything; the
    * one-row middle wave is what arms the filter for wave 3 with the
    * wave-1 watermark, max(even ts) − 2 h.
    */
  private def stagedLateWaves(s: SparkSession, d: String): String = {
    val dir = Paths.get(Scratch.dir("st7_events", d))
    val ready = dir.resolve("_READY")
    Scratch.sync(dir.toString) { if (!Files.exists(ready)) {
      Files.createDirectories(dir)
      // raw read: waves must carry the source log's parquet ts flavor
      val ev = s.read.parquet(s"$d/events.parquet")
      // fixture staging, once per (process, sf dir): the global row_number
      // only picks the newest odd row to pin the wave schedule — never a
      // production plan
      val odd = ev.filter(col("event_id") % 2 === 1).withColumn("_rn",
        row_number().over(Window.orderBy(col("ts").desc, col("event_id").desc)))
      val waves = Seq(
        ("a_even.parquet", ev.filter(col("event_id") % 2 === 0)),
        ("b_tip.parquet", odd.filter(col("_rn") === 1).drop("_rn")),
        ("c_late.parquet", odd.filter(col("_rn") > 1).drop("_rn")))
      waves.zipWithIndex.foreach { case ((name, df), i) =>
        val tmp = Files.createTempDirectory("graft_st7")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = Files.list(tmp)
          .filter(_.getFileName.toString.startsWith("part-")).findFirst.get
        Files.copy(part, dir.resolve(name))
        Files.setLastModifiedTime(dir.resolve(name),
          java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
      }
      Files.createFile(ready)
    } }
    dir.toString
  }

  val queries: Map[String, Q] = Map(
    // ---- u5: MERGE INTO (delete / update / insert in one pass) ----
    // Target = supplier; the change feed is derived deterministically
    // from the same table: key%10==0 deletes, else key%3==0 adds 100 to
    // the balance, key%7==0 inserts a new 1000000+key supplier. One
    // full-outer join on the merge key + a row-local projection — the
    // plan every lakehouse engine lowers MERGE to; co-bucketed inputs
    // would make it shuffle-free (s11 layout contract).
    "u5_merge_into" -> ((s, d) => {
      val tgt = t(s, d, "supplier").select("s_suppkey", "s_name", "s_acctbal")
      val sup = t(s, d, "supplier").select(col("s_suppkey").as("sk"))
      val dels = sup.filter(col("sk") % 10 === 0)
        .select(col("sk").as("k"), lit("delete").as("op"), lit(0.0).as("v"))
      val upds = sup.filter(col("sk") % 10 =!= 0 && col("sk") % 3 === 0)
        .select(col("sk").as("k"), lit("update").as("op"), lit(100.0).as("v"))
      val ins = sup.filter(col("sk") % 7 === 0)
        .select((col("sk") + 1000000L).as("k"), lit("insert").as("op"),
          round(col("sk") * 1.5, 2).as("v"))
      MergeInto(tgt, dels.union(upds).union(ins), "s_suppkey", "k",
        deleteWhen = Some(col("op") === "delete"),
        updateSet = Map(
          "s_acctbal" -> round(col("s_acctbal") + col("v"), 2)),
        insertValues = Map(
          "s_suppkey" -> col("k"),
          "s_name" -> concat(lit("NEW_"), col("k")),
          "s_acctbal" -> col("v")))
        .orderBy("s_suppkey")
    }),

    // ---- tp9: weighted sampling without replacement ----
    // Efraimidis–Spirakis: key_i = ln(u_i) / w_i with u_i uniform in
    // (0,1], take the k largest keys — the distributed one-pass weighted
    // sample (a TakeOrdered, no global sort of the corpus). u_i derives
    // from md5(doc_id) (the t7 split precedent), so the "randomness" is
    // a pure function of the row and the oracle restates it; weights are
    // document lengths — the "sample long documents more" shaping policy.
    "tp9_weighted_sample" -> ((s, d) =>
      t(s, d, "documents").filter(col("n_chars") > 0)
        .withColumn("hv",
          conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("double"))
        .withColumn("skey",
          log((col("hv") + 1.0) / 4294967296.0) / col("n_chars"))
        .orderBy(col("skey").desc, col("doc_id"))
        .limit(100)
        .select(col("doc_id"), col("n_chars"))),

    // ---- st7: the watermark's late-data drop, replayed exactly ----
    // Even-id events arrive as wave 1, the newest odd row as wave 2,
    // every other odd row as wave 3 (one file per micro-batch, pinned
    // order). Processing wave 3, the late-record filter holds the
    // wave-1 watermark — max(even ts, ms-floored) − 2 h — so wave-3
    // rows whose HOUR WINDOW closed by then are discarded by the
    // aggregation; everything else still merges into surviving state.
    // Update-mode emissions accumulate in the memory sink; the final
    // state per window is its max-n emission (n strictly grows on
    // re-emission). The oracle computes the same watermark arithmetic
    // in SQL and aggregates only the surviving rows — certifying the
    // drop semantics themselves, boundary math included.
    "st7_late_drop" -> ((s, d) => {
      val dir = stagedLateWaves(s, d)
      val schema = graft.streaming.EventStream.cachedSchema(s, dir)
      val stream = EventStream.normalize(s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir))
      val agg = EventStream.hourlyAgg(stream) // 2 h watermark
      // Update mode emits changed windows in the data batches themselves;
      // the no-data batch only evicts state silently — skipping it saves
      // one state-commit cycle per wave (3 waves here) and changes nothing
      // in the sink
      val mem = Extended18.runToCompletion(s, agg, "st7_mem", OutputMode.Update(),
        noDataBatches = false)
      mem.groupBy("hour_ts", "event_type")
        .agg(max(struct(col("n"), col("total"))).as("m"))
        .select(col("hour_ts"), col("event_type"),
          col("m.n").as("n"), col("m.total").as("total"))
        .orderBy("hour_ts", "event_type")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "u5_merge_into" ->
      """WITH src AS (
           SELECT s_suppkey AS k, 'delete' AS op, 0.0 AS v
           FROM supplier WHERE s_suppkey % 10 = 0
           UNION ALL
           SELECT s_suppkey, 'update', 100.0
           FROM supplier WHERE s_suppkey % 10 <> 0 AND s_suppkey % 3 = 0
           UNION ALL
           SELECT s_suppkey + 1000000, 'insert', round(s_suppkey * 1.5, 2)
           FROM supplier WHERE s_suppkey % 7 = 0),
         j AS (
           SELECT t.s_suppkey AS tk, t.s_name, t.s_acctbal, s.k, s.op, s.v
           FROM supplier t FULL OUTER JOIN src s ON t.s_suppkey = s.k)
         SELECT
           CASE WHEN tk IS NULL THEN k ELSE tk END AS s_suppkey,
           CASE WHEN tk IS NULL THEN 'NEW_' || k ELSE s_name END AS s_name,
           CASE WHEN tk IS NULL THEN v
                WHEN k IS NOT NULL AND op = 'update'
                  THEN round(s_acctbal + v, 2)
                ELSE s_acctbal END AS s_acctbal
         FROM j
         WHERE NOT (tk IS NOT NULL AND k IS NOT NULL AND op = 'delete')
         ORDER BY s_suppkey""",
    "tp9_weighted_sample" ->
      """WITH h AS (
           SELECT doc_id, n_chars,
             CAST(list_reduce(list_transform(range(1, 9),
               i -> CAST(strpos('0123456789abcdef',
                 substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)),
               (a, b) -> a * 16 + b) AS DOUBLE) AS hv
           FROM documents WHERE n_chars > 0)
         SELECT doc_id, n_chars FROM h
         ORDER BY ln((hv + 1.0) / 4294967296.0) / n_chars DESC, doc_id
         LIMIT 100""",
    "st7_late_drop" ->
      """WITH ev AS (
           SELECT event_id, event_type, value,
             CAST(epoch_us(ts) AS BIGINT) AS us
           FROM events),
         wm AS (
           SELECT (max(us) // 1000) - 7200000 AS wm_ms
           FROM ev WHERE event_id % 2 = 0),
         tip AS (
           SELECT event_id FROM ev WHERE event_id % 2 = 1
           ORDER BY us DESC, event_id DESC LIMIT 1),
         kept AS (
           SELECT * FROM ev
           WHERE event_id % 2 = 0
              OR event_id IN (SELECT event_id FROM tip)
              OR ((us // 3600000000) + 1) * 3600000 > (SELECT wm_ms FROM wm))
         SELECT (us // 3600000000) * 3600 AS hour_ts, event_type,
           count(*) AS n, round(sum(value), 2) AS total
         FROM kept GROUP BY 1, 2 ORDER BY hour_ts, event_type"""
  )
}
