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
    val probes = cents.sortBy { case (_, c) => -cos(queryVec.toArray, c) }
      .take(nProbe).map(_._1).toSeq

    val q = array(queryVec.map(lit): _*)
    // centroid assignment is a native codegen'd expression (AnnKernel):
    // the scan → assign → probe-filter → cosine stage stays one
    // whole-stage-codegen span, no ScalaUDF plan break
    embeddings
      .withColumn("_cid", graft.functions.VectorFunctions.nearestCentroid(
        col(vecCol), cents.map(_._2)))
      .filter(col("_cid").isin(probes: _*))
      .select(col(idCol), cosine(col(vecCol), q).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Product-quantization ANN: encode each vector as `m` one-byte codes
    * (argmin L2 to a per-subspace codebook), score candidates with the
    * asymmetric-distance lookup table of the query, keep the best `refine`
    * by approximate distance, then exact-cosine re-rank to top-`k`.
    *
    * At 100 TB the encode pass runs once at ingest and the scan reads
    * m bytes per vector instead of the full embedding — the candidate
    * stage is a codegen-friendly projection over a 64x smaller column.
    * Codebooks here are the deterministic first-`ksub` vectors' subvectors
    * (same convention as [[ivfTopK]]'s first-k centroids) so results are
    * reproducible and the DuckDB oracle can restate them; k-means training
    * drops in without changing the query path.
    *
    * Determinism contract with the oracle: centroid argmin takes the
    * LOWEST centroid id on exact ties, and both the per-subspace distance
    * fold and the m-term table sum run in ascending index order, so every
    * double matches bit-for-bit.
    */
  def pqTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      queryVec: Seq[Double], k: Int, m: Int = 8, ksub: Int = 16,
      refine: Int = 50): DataFrame = {
    val dim = queryVec.length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    // codebook(j)(c) = subvector j of the c-th training vector
    val training: Array[Array[Double]] = embeddings.orderBy(col(idCol))
      .limit(ksub).select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(training.length == ksub,
      s"PQ needs at least ksub=$ksub training vectors, got ${training.length}")
    val codebook: Array[Array[Array[Double]]] =
      Array.tabulate(m, ksub)((j, c) => training(c).slice(j * subDim, (j + 1) * subDim))

    def l2(a: Array[Double], aOff: Int, b: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < b.length) { val t = a(aOff + i) - b(i); d += t * t; i += 1 }
      d
    }
    // asymmetric-distance table: query subvector vs every centroid
    val qArr = queryVec.toArray
    val table: Array[Array[Double]] =
      Array.tabulate(m, ksub)((j, c) => l2(qArr, j * subDim, codebook(j)(c)))
    val q = array(queryVec.map(lit): _*)
    // encode + ADC are native codegen'd expressions (AnnKernel): strict-<
    // argmin (ties keep lowest id) and ascending-j fold, identical to the
    // former UDFs; the candidate stage is one codegen span over the scan
    embeddings
      .withColumn("_codes", graft.functions.VectorFunctions.pqEncode(
        col(vecCol), codebook))
      .withColumn("_ad", graft.functions.VectorFunctions.pqAdist(col("_codes"), table))
      .orderBy(col("_ad").asc, col(idCol))
      .limit(refine)
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
