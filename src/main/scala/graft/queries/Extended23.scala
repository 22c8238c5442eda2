package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.Tables.t
import graft.streaming.EventStream

/** Round-6 surface extensions, batch 23: the streaming keyed first-wins
  * dedup replayed under the DuckDB oracle gate — the last streaming
  * operator that was spec-gated only. Documents arrive in two waves
  * (doc_id parity, pinned file mtimes, one file per micro-batch): a
  * fingerprint seen in wave 0 keeps its smallest even id and marks every
  * wave-1 arrival a duplicate (cross-batch state), a fingerprint first
  * seen in wave 1 keeps its smallest odd id (within-batch ordering) — all
  * of which the oracle restates as one grouped coalesce(min-even, min).
  */
object Extended23 {
  type Q = (SparkSession, String) => DataFrame

  /** Stage the documents as two wave files by doc_id parity with pinned
    * increasing mtimes (the file source orders by mtime), once per
    * (process, sf dir). */
  private def stagedDocWaves(s: SparkSession, d: String): String = {
    val dir = Paths.get(Scratch.dir("st4_docs", d))
    val ready = dir.resolve("_READY")
    Scratch.sync(dir.toString) { if (!Files.exists(ready)) {
      Files.createDirectories(dir)
      val docs = t(s, d, "documents")
      Seq(("a_wave0.parquet", 0), ("b_wave1.parquet", 1)).foreach {
        case (name, par) =>
          val tmp = Files.createTempDirectory("graft_st4")
          docs.filter(col("doc_id") % 2 === par).coalesce(1)
            .write.mode("overwrite").parquet(tmp.toString)
          val part = Files.list(tmp)
            .filter(_.getFileName.toString.startsWith("part-")).findFirst.get
          Files.copy(part, dir.resolve(name))
      }
      Seq("a_wave0.parquet", "b_wave1.parquet").zipWithIndex.foreach {
        case (n, i) =>
          Files.setLastModifiedTime(dir.resolve(n),
            java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
      }
      Files.createFile(ready)
    } }
    dir.toString
  }

  val queries: Map[String, Q] = Map(
    // ---- st4: streaming first-wins keyed dedup, two-wave replay ----
    // The fingerprint is tp3's normalized content key (sorted distinct
    // word set), so shuffled boilerplate collides; state per key is one
    // boolean. maxFilesPerTrigger=1 forces the two-micro-batch schedule
    // the semantics are defined over.
    "st4_stream_firstwins" -> ((s, d) => {
      val dir = stagedDocWaves(s, d)
      val schema = graft.streaming.EventStream.cachedSchema(s, dir)
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .select(col("doc_id"),
          md5(concat_ws(" ",
            array_sort(array_distinct(split(col("text"), " ")))).cast("binary"))
            .as("fp"))
      val out = EventStream.firstWins(s, stream, "fp", "doc_id")
      Extended18.runToCompletion(s, out, "st4_mem", OutputMode.Append())
        .orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "st4_stream_firstwins" ->
      """WITH f AS (
           SELECT doc_id,
             md5(array_to_string(
               list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
           FROM documents),
         keep AS (
           SELECT fp,
             coalesce(min(CASE WHEN doc_id % 2 = 0 THEN doc_id END),
                      min(doc_id)) AS keeper
           FROM f GROUP BY fp)
         SELECT f.doc_id,
           CASE WHEN f.doc_id = k.keeper THEN 'keep' ELSE 'dup' END AS status
         FROM f JOIN keep k ON f.fp = k.fp
         ORDER BY f.doc_id"""
  )
}
