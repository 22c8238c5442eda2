package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity
import graft.store.AnnStore

/** Persistence of trained ANN artifacts (graft.store.AnnStore): the
  * train-once/query-many contract. An index built in one session, saved,
  * and loaded in ANOTHER session must hold bit-identical parameters and
  * answer queries identically to the in-memory artifact — no retraining.
  */
class AnnStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def emb = Tables.t(spark, sf, "embeddings")
  private def rest = emb.filter(col("vec_id") =!= 0)
  private def qv: Seq[Double] = emb.filter(col("vec_id") === 0)
    .select(col("embedding").cast("array<double>")).head.getSeq[Double](0)

  private def scratch(tag: String): String =
    Files.createTempDirectory(s"graft-annstore-$tag").resolve("idx").toString

  test("IVF round trip is bit-exact and query-identical across sessions") {
    val built = Similarity.buildIvfIndex(rest, "vec_id", "embedding",
      nCentroids = 16, trainIters = 2)
    val path = scratch("ivf")
    AnnStore.saveIvf(spark, built, path)

    // a FRESH session (own session state) stands in for the next day's
    // query job: load must reproduce the training bit-for-bit
    val session2 = spark.newSession()
    val loaded = AnnStore.loadIvf(session2, path)
    assert(loaded.centroids.length == built.centroids.length)
    built.centroids.zip(loaded.centroids).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "centroid doubles must round-trip bit-exactly")
    }

    val viaBuilt = Similarity.ivfTopKWith(built, rest, "vec_id", "embedding",
      qv, 10, nProbe = 6).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaLoaded = Similarity.ivfTopKWith(loaded,
      Tables.t(session2, sf, "embeddings").filter(col("vec_id") =!= 0),
      "vec_id", "embedding", qv, 10, nProbe = 6)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaBuilt == viaLoaded)
  }

  test("PQ codebook round trip is bit-exact and query-identical") {
    val built = Similarity.buildPqIndex(rest, "vec_id", "embedding",
      dim = qv.length, m = 8, ksub = 16, trainIters = 2)
    val path = scratch("pq")
    AnnStore.savePq(spark, built, path)
    val loaded = AnnStore.loadPq(spark, path)
    assert((loaded.m, loaded.ksub, loaded.subDim) == (built.m, built.ksub, built.subDim))
    for (j <- 0 until built.m; c <- 0 until built.ksub)
      assert(java.util.Arrays.equals(built.codebook(j)(c), loaded.codebook(j)(c)))
    val a = Similarity.pqTopKWith(built, rest, "vec_id", "embedding", qv, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = Similarity.pqTopKWith(loaded, rest, "vec_id", "embedding", qv, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b)
  }

  test("SQ8 grid round trip is bit-exact and query-identical") {
    val built = Similarity.buildSq8Index(rest, "embedding")
    val path = scratch("sq8")
    AnnStore.saveSq8(spark, built, path)
    val loaded = AnnStore.loadSq8(spark, path)
    assert(java.util.Arrays.equals(built.mins, loaded.mins))
    assert(java.util.Arrays.equals(built.maxs, loaded.maxs))
    val a = Similarity.sq8TopKWith(built, rest, "vec_id", "embedding", qv, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = Similarity.sq8TopKWith(loaded, rest, "vec_id", "embedding", qv, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b)
  }

  test("kind header is enforced and discoverable") {
    val path = scratch("kind")
    AnnStore.saveSq8(spark, Similarity.buildSq8Index(rest, "embedding"), path)
    assert(AnnStore.kindOf(path) == "sq8")
    val err = intercept[IllegalArgumentException](AnnStore.loadIvf(spark, path))
    assert(err.getMessage.contains("sq8"))
  }

  test("stored indexed table answers identically to the in-memory index paths") {
    val path = scratch("table")
    AnnStore.writeIndexedTable(spark, rest, "vec_id", "embedding", path,
      nCentroids = 16, m = 8, ksub = 16, trainIters = 2)
    // IVF: partition-pruned stored scan == in-memory assignment scan
    val builtIvf = Similarity.buildIvfIndex(rest, "vec_id", "embedding",
      nCentroids = 16, trainIters = 2)
    val viaMem = Similarity.ivfTopKWith(builtIvf, rest, "vec_id", "embedding",
      qv, 10, nProbe = 6).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaStored = AnnStore.ivfTopKStored(spark, path, "vec_id", "embedding",
      qv, 10, nProbe = 6).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaStored == viaMem)
    // PQ: stored-codes candidates == inline-encode candidates
    val builtPq = Similarity.buildPqIndex(rest, "vec_id", "embedding",
      dim = qv.length, m = 8, ksub = 16, trainIters = 2)
    val pqMem = Similarity.pqTopKWith(builtPq, rest, "vec_id", "embedding",
      qv, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val pqStored = AnnStore.pqTopKStored(spark, path, "vec_id", "embedding",
      qv, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(pqStored == pqMem)
    // the layout really is partitioned by _cid
    val cells = new java.io.File(s"$path/data").listFiles()
      .filter(_.getName.startsWith("_cid="))
    assert(cells.length > 1, "expected multiple _cid partition directories")
    assert(AnnStore.kindOf(path) == "indexed_table")
  }

  test("append absorbs new vectors under the existing index, no retrain") {
    val path = scratch("append")
    val half = rest.filter(col("vec_id") % 2 === 0)
    val other = rest.filter(col("vec_id") % 2 === 1)
    AnnStore.writeIndexedTable(spark, half, "vec_id", "embedding", path,
      nCentroids = 8, m = 8, ksub = 16, trainIters = 1)
    AnnStore.appendToIndexedTable(spark, other, "vec_id", "embedding", path)
    // contract: stored query over the appended table == the SAME
    // artifacts (trained on the first half only) over the whole corpus
    val idx = AnnStore.loadIvf(spark, s"$path/_index/ivf")
    val viaMem = Similarity.ivfTopKWith(idx, rest, "vec_id", "embedding",
      qv, 10, nProbe = 4).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaStored = AnnStore.ivfTopKStored(spark, path, "vec_id", "embedding",
      qv, 10, nProbe = 4).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaStored == viaMem)
    val pqIdx = AnnStore.loadPq(spark, s"$path/_index/pq")
    val pqMem = Similarity.pqTopKWith(pqIdx, rest, "vec_id", "embedding",
      qv, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val pqStored = AnnStore.pqTopKStored(spark, path, "vec_id", "embedding",
      qv, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(pqStored == pqMem)
  }

  test("a vector STREAM ingests into the stored index via foreachBatch append") {
    // the streaming-ingest shape at 100 TB: vectors arrive as a stream,
    // each micro-batch is encoded by the EXISTING artifacts and absorbed
    // into the partition layout (appendToIndexedTable as the custom
    // sink) — never a retrain, and the stored query path sees every
    // committed batch. A dedicated landing-dir + foreachBatch is the
    // correct sink: a direct streaming parquet sink into data/ would
    // plant a _spark_metadata log that hides the batch-written files.
    val path = scratch("stream")
    val half = rest.filter(col("vec_id") % 2 === 0)
    val other = rest.filter(col("vec_id") % 2 === 1)
    AnnStore.writeIndexedTable(spark, half, "vec_id", "embedding", path,
      nCentroids = 8, m = 8, ksub = 16, trainIters = 1)

    val src = java.nio.file.Files.createTempDirectory("graft-annstream")
    TestSpark.stageSingleParquet(other, src, "arrivals.parquet")
    val stream = spark.readStream.schema(other.schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        AnnStore.appendToIndexedTable(spark, batch, "vec_id", "embedding", path)
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-annstream-ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val idx = AnnStore.loadIvf(spark, s"$path/_index/ivf")
    val viaMem = Similarity.ivfTopKWith(idx, rest, "vec_id", "embedding",
      qv, 10, nProbe = 4).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaStored = AnnStore.ivfTopKStored(spark, path, "vec_id", "embedding",
      qv, 10, nProbe = 4).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaStored == viaMem,
      "stored query must see the streamed-in vectors, encoded by the existing index")
  }

  test("compact collapses appended files per bucket, results unchanged") {
    val path = scratch("compact")
    val half = rest.filter(col("vec_id") % 2 === 0)
    val other = rest.filter(col("vec_id") % 2 === 1)
    AnnStore.writeIndexedTable(spark, half, "vec_id", "embedding", path,
      nCentroids = 8, m = 8, ksub = 16, trainIters = 1)
    AnnStore.appendToIndexedTable(spark, other, "vec_id", "embedding", path)
    val before = graft.store.GraphPackage.countDataFiles(s"$path/data")
    val resBefore = AnnStore.ivfTopKStored(spark, path, "vec_id", "embedding",
      qv, 10, nProbe = 4).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    AnnStore.compactIndexedTable(spark, path)
    val after = graft.store.GraphPackage.countDataFiles(s"$path/data")
    assert(after < before, s"compaction must shrink file count ($before -> $after)")
    val resAfter = AnnStore.ivfTopKStored(spark, path, "vec_id", "embedding",
      qv, 10, nProbe = 4).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(resAfter == resBefore)
    assert(AnnStore.kindOf(path) == "indexed_table", "header must survive compaction")
  }

  test("save over an existing artifact atomically replaces it") {
    val path = scratch("swap")
    val idx4 = Similarity.buildIvfIndex(rest, "vec_id", "embedding",
      nCentroids = 4, trainIters = 1)
    val idx8 = Similarity.buildIvfIndex(rest, "vec_id", "embedding",
      nCentroids = 8, trainIters = 1)
    AnnStore.saveIvf(spark, idx4, path)
    AnnStore.saveIvf(spark, idx8, path)
    assert(AnnStore.loadIvf(spark, path).centroids.length == 8)
  }
}
