package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.store.AnnStore

/** Round-7 surface extensions, batch 57: the STORED ANN index table —
  * the 100 TB layout where centroid assignment and PQ codes are computed
  * once at write time ([[AnnStore.writeIndexedTable]]):
  *
  *  - ann_ivf_stored_topk: the probe filter hits the stored `_cid`
  *    PARTITION column, so the scan opens only nProbe/nCentroids of the
  *    files — the plan shows real partition pruning (PlanSpec asserts
  *    it), not a per-row assignment pass.
  *  - ann_pq_stored_topk: the candidate stage scans only (id, `_codes`)
  *    — m bytes per vector — and the exact re-rank fetches full vectors
  *    for just the refine survivors.
  *
  * Both share their DuckDB oracles VERBATIM with the in-memory forms
  * (ann_ivf_topk / ann_pq_topk): training is the same deterministic
  * fixed-point Lloyd on the same rows, so a stored-then-queried index
  * must be hash-identical to the train-and-query-in-one-session form.
  * The table is staged once per (process, sf dir); reps then measure the
  * QUERY path alone — which is the point of the build/query split.
  */
object Extended57 {
  type Q = (SparkSession, String) => DataFrame

  /** Build the indexed table once per (process, sf dir). */
  private def stagedIndexedTable(s: SparkSession, d: String): String = {
    val dir = Paths.get(Scratch.dir("ann_table", d))
    val ready = dir.resolve("_READY")
    Scratch.sync(dir.toString) { if (!Files.exists(ready)) {
      Files.createDirectories(dir)
      val rest = t(s, d, "embeddings").filter(col("vec_id") =!= 0)
      AnnStore.writeIndexedTable(s, rest, "vec_id", "embedding",
        dir.resolve("table").toString,
        nCentroids = 16, m = 8, ksub = 16, trainIters = 2)
      Files.createFile(ready)
    } }
    dir.resolve("table").toString
  }

  private def queryVec(s: SparkSession, d: String): Seq[Double] =
    t(s, d, "embeddings").filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head.getSeq[Double](0)

  val queries: Map[String, Q] = Map(
    "ann_ivf_stored_topk" -> ((s, d) =>
      AnnStore.ivfTopKStored(s, stagedIndexedTable(s, d), "vec_id",
          "embedding", queryVec(s, d), k = 10, nProbe = 6)
        .select(col("vec_id"), round(col("sim"), 4).as("sim"))),

    "ann_pq_stored_topk" -> ((s, d) =>
      AnnStore.pqTopKStored(s, stagedIndexedTable(s, d), "vec_id",
          "embedding", queryVec(s, d), k = 10, refine = 50)
        .select(col("vec_id"), round(col("sim"), 4).as("sim")))
  )

  // the oracles are the in-memory forms' SQL, shared by reference so the
  // stored and in-memory contracts can never drift apart
  val oracleSql: Map[String, String] = Map(
    "ann_ivf_stored_topk" -> LlmQueries.oracleSql("ann_ivf_topk"),
    "ann_pq_stored_topk" -> Extended8.oracleSql("ann_pq_topk")
  )
}
