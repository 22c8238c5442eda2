package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (broadcast the query vector, one
  * codegen'd pass, TakeOrderedAndProject). Scale path: LSH bucketing by
  * deterministic random-hyperplane signs — candidates share a bucket, so
  * the full scan is replaced by a bucket-pruned scan; recall is tested
  * against the brute-force oracle in the spec suite.
  */
object Similarity {

  /** Dot product — native codegen'd Catalyst expression
    * (graft.functions.DotProduct); same ascending-index fold as the
    * higher-order-function form, ~10× faster on pair joins.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity computed in double precision regardless of input
    * element type (float32 inputs are widened first — keeps parity with
    * any double-precision oracle).
    */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** Exact top-k nearest neighbours of `queryVec` by cosine. */
  def bruteForceTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      queryVec: Seq[Double], k: Int): DataFrame = {
    val q = array(queryVec.map(lit): _*)
    embeddings
      .select(col(idCol), cosine(col(vecCol), q).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic random-hyperplane LSH signature (`nBits` sign bits).
    * Hyperplane weights come from a fixed splitmix64 stream of (bit, dim),
    * so signatures are stable across runs and cluster deployments.
    */
  def hyperplaneSignature(vec: Column, dim: Int, nBits: Int = 16): Column = {
    val vd = vec.cast("array<double>")
    val bits: Seq[Column] = (0 until nBits).map { b =>
      val w = array((0 until dim).map(d => lit(coeff(b, d))): _*)
      when(dot(vd, w) >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  private def coeff(b: Int, d: Int): Double =
    // map to (-1, 1)
    graft.functions.Hashing.splitmix64(b.toLong << 32 | d.toLong).toDouble /
      Long.MaxValue.toDouble

  /** The hyperplane rows (bit → weight vector) — shared with the SQL
    * oracle builder so the two implementations cannot drift.
    */
  private[graft] def planeRows(dim: Int, nBits: Int): Seq[(Int, Seq[Double])] =
    (0 until nBits).map(b => b -> (0 until dim).map(d => coeff(b, d)))

  /** ANN top-k: prune to vectors whose signature is within `maxBitDiff`
    * bits of the query signature (checked via bit_count of xor), then exact
    * cosine on the survivors. At scale the signature is a stored, bucketed
    * column; here it is computed inline.
    */
  def lshTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      queryVec: Seq[Double], k: Int, dim: Int, nBits: Int = 16,
      maxBitDiff: Int = 6): DataFrame = {
    val qSig = {
      // driver-side signature of the query vector (same coeff stream)
      var sig = 0L
      (0 until nBits).foreach { b =>
        val s = (0 until dim).map(d => queryVec(d) * coeff(b, d)).sum
        if (s >= 0) sig |= (1L << b)
      }
      sig
    }
    val q = array(queryVec.map(lit): _*)
    embeddings
      .withColumn("_sig", hyperplaneSignature(col(vecCol), dim, nBits))
      .filter(expr(s"bit_count(_sig ^ ${qSig}L) <= $maxBitDiff"))
      .select(col(idCol), cosine(col(vecCol), q).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** IVF (inverted-file) ANN: vectors are assigned to their nearest
    * centroid once (a stored bucket column at scale); a query probes only
    * the `nProbe` centroids nearest to it, then runs exact cosine on that
    * fraction of the corpus. Centroids here are the first `nCentroids`
    * vectors by id — deterministic and oracle-friendly; k-means refinement
    * drops in without changing the query path.
    */
  def ivfTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      queryVec: Seq[Double], k: Int, nCentroids: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val cents: Array[(Int, Array[Double])] = embeddings.orderBy(col(idCol))
      .limit(nCentroids).select(col(vecCol).cast("array<double>"))
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0).toArray) }

    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val assign = udf((v: Seq[Double]) => {
      val arr = v.toArray
      cents.maxBy { case (_, c) => cos(arr, c) }._1
    })
    val probes = cents.sortBy { case (_, c) => -cos(queryVec.toArray, c) }
      .take(nProbe).map(_._1).toSeq

    val q = array(queryVec.map(lit): _*)
    embeddings
      .withColumn("_cid", assign(col(vecCol).cast("array<double>")))
      .filter(col("_cid").isin(probes: _*))
      .select(col(idCol), cosine(col(vecCol), q).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Top-`k` most-similar pairs across the corpus (brute force, for the
    * oracle gate; LSH/banding covers the 100 TB path). Norms are computed
    * once per vector before the pair join, not once per pair.
    */
  def topSimilarPairs(embeddings: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val prepped = embeddings.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
    val a = graft.operators.Par.fanOut(
      prepped.select(col("id").as("a"), col("v").as("va"), col("nrm").as("na")))
    val b = prepped.select(col("id").as("b"), col("v").as("vb"), col("nrm").as("nb"))
    a.crossJoin(b).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4).as("sim"))
      .orderBy(col("sim").desc, col("a"), col("b"))
      .limit(k)
  }
}
