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

  /** Deterministic distributed Lloyd refinement (spherical k-means).
    * Seeded from the first `nCentroids` vectors by id, then `iters`
    * iterations of: assign every vector to its most-cosine-similar
    * centroid (the codegen'd [[graft.functions.NearestCentroid]] kernel —
    * first-max tie-break), recompute each centroid as the per-dimension
    * mean of its members, keep the old centroid for empty clusters.
    *
    * The mean is computed over FIXED-POINT values — `floor(x * 2^24)`
    * summed as longs — because a distributed double sum is
    * order-dependent (partial-aggregate combine order varies run to run)
    * and would break both determinism and the bit-exact DuckDB oracle.
    * Long sums commute; the single double division per (centroid, dim)
    * is then identical on both engines.
    *
    * Each iteration is one partial-aggregated shuffle of n×dim skinny
    * rows and a k×dim collect — the standard scale shape for Lloyd on a
    * cluster; at 100 TB the same loop runs on a sample.
    */
  def trainCentroids(embeddings: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, iters: Int): Array[Array[Double]] = {
    require(nCentroids > 0 && iters >= 0,
      s"need nCentroids > 0 and iters >= 0, got $nCentroids/$iters")
    var cents: Array[Array[Double]] = embeddings.orderBy(col(idCol))
      .limit(nCentroids).select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(cents.nonEmpty, "IVF training needs at least one vector")
    var it = 0
    while (it < iters) {
      val rows = embeddings
        .select(
          graft.functions.VectorFunctions.nearestCentroid(col(vecCol), cents).as("cid"),
          posexplode(col(vecCol).cast("array<double>")).as(Seq("p", "x")))
        .groupBy("cid", "p")
        .agg(sum(floor(col("x") * lit(16777216.0))).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      rows.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) =
          (r.getLong(2).toDouble / r.getLong(3)) / 16777216.0
      }
      cents = next
      it += 1
    }
    cents
  }

  /** Per-subspace L2 k-means for PQ codebooks — same determinism design
    * as [[trainCentroids]] (fixed-point means, strict-< lowest-id argmin
    * via the codegen'd [[graft.functions.PqEncode]] kernel, empty cells
    * keep their seed). All `m` subspaces train in the same pass: one
    * encode + skinny-row shuffle per iteration, m×ksub×subDim collect.
    */
  def trainCodebook(embeddings: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, subDim: Int, iters: Int): Array[Array[Array[Double]]] = {
    // codebook(j)(c) = subvector j of the c-th seed vector
    val training: Array[Array[Double]] = embeddings.orderBy(col(idCol))
      .limit(ksub).select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(training.length == ksub,
      s"PQ needs at least ksub=$ksub training vectors, got ${training.length}")
    var cb: Array[Array[Array[Double]]] =
      Array.tabulate(m, ksub)((j, c) => training(c).slice(j * subDim, (j + 1) * subDim))
    var it = 0
    while (it < iters) {
      val rows = embeddings
        .select(graft.functions.VectorFunctions.pqEncode(col(vecCol), cb).as("codes"),
          col(vecCol).cast("array<double>").as("v"))
        .select(posexplode(col("codes")).as(Seq("j", "c")), col("v"))
        .select(col("j"), col("c"),
          posexplode(expr(s"slice(v, j * $subDim + 1, $subDim)")).as(Seq("p", "x")))
        .groupBy("j", "c", "p")
        .agg(sum(floor(col("x") * lit(16777216.0))).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cb.map(_.map(_.clone()))
      rows.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
          (r.getLong(3).toDouble / r.getLong(4)) / 16777216.0
      }
      cb = next
      it += 1
    }
    cb
  }

  /** A trained IVF index — the build-once artifact. At 100 TB training
    * runs once at index-build time (and the assignment becomes a stored,
    * bucketed `_cid` column); queries then reuse the centroids with zero
    * training cost. [[ivfTopK]] is the convenience form that builds and
    * queries in one call.
    */
  case class IvfIndex(centroids: Array[Array[Double]])

  def buildIvfIndex(embeddings: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int = 16, trainIters: Int = 2): IvfIndex =
    IvfIndex(trainCentroids(embeddings, idCol, vecCol, nCentroids, trainIters))

  /** IVF (inverted-file) ANN: vectors are assigned to their nearest
    * centroid once (a stored bucket column at scale); a query probes only
    * the `nProbe` centroids nearest to it, then runs exact cosine on that
    * fraction of the corpus. Centroids are k-means-trained by
    * [[trainCentroids]] (`trainIters` Lloyd iterations over a
    * deterministic first-k seed; 0 = raw seed), so buckets track the
    * actual embedding distribution instead of the first k rows.
    */
  def ivfTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      queryVec: Seq[Double], k: Int, nCentroids: Int = 16,
      nProbe: Int = 4, trainIters: Int = 2): DataFrame =
    ivfTopKWith(buildIvfIndex(embeddings, idCol, vecCol, nCentroids, trainIters),
      embeddings, idCol, vecCol, queryVec, k, nProbe)

  /** The `nProbe` centroid ids most cosine-similar to the query — the
    * driver-side probe selection shared by the in-memory and stored
    * query paths.
    */
  private[graft] def nearestProbes(index: IvfIndex, queryVec: Seq[Double],
      nProbe: Int): Seq[Int] = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    index.centroids.zipWithIndex
      .sortBy { case (c, _) => -cos(queryVec.toArray, c) }
      .take(nProbe).map(_._2).toSeq
  }

  /** Query path against a pre-built [[IvfIndex]] — no training jobs. */
  def ivfTopKWith(index: IvfIndex, embeddings: DataFrame, idCol: String,
      vecCol: String, queryVec: Seq[Double], k: Int, nProbe: Int = 4): DataFrame = {
    val probes = nearestProbes(index, queryVec, nProbe)

    val q = array(queryVec.map(lit): _*)
    // centroid assignment is a native codegen'd expression (AnnKernel):
    // the scan → assign → probe-filter → cosine stage stays one
    // whole-stage-codegen span, no ScalaUDF plan break
    embeddings
      .withColumn("_cid", graft.functions.VectorFunctions.nearestCentroid(
        col(vecCol), index.centroids))
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
    * Codebooks are k-means-trained by [[trainCodebook]] (`trainIters`
    * L2-Lloyd iterations per subspace over a deterministic first-`ksub`
    * seed; 0 = raw seed).
    *
    * Determinism contract with the oracle: centroid argmin takes the
    * LOWEST centroid id on exact ties, and both the per-subspace distance
    * fold and the m-term table sum run in ascending index order, so every
    * double matches bit-for-bit.
    */
  /** A trained PQ codebook — the build-once artifact; see [[IvfIndex]].
    * At 100 TB the `_codes` column is also written at ingest, so queries
    * scan m bytes per vector with no encode either.
    */
  case class PqIndex(codebook: Array[Array[Array[Double]]]) {
    def m: Int = codebook.length
    def ksub: Int = codebook(0).length
    def subDim: Int = codebook(0)(0).length
  }

  def buildPqIndex(embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int = 8, ksub: Int = 16, trainIters: Int = 2): PqIndex = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    PqIndex(trainCodebook(embeddings, idCol, vecCol, m, ksub, dim / m, trainIters))
  }

  def pqTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      queryVec: Seq[Double], k: Int, m: Int = 8, ksub: Int = 16,
      refine: Int = 50, trainIters: Int = 2): DataFrame =
    pqTopKWith(
      buildPqIndex(embeddings, idCol, vecCol, queryVec.length, m, ksub, trainIters),
      embeddings, idCol, vecCol, queryVec, k, refine)

  /** The query's asymmetric-distance lookup table (per-subspace L2 to
    * every codeword) — driver-side, shared by the in-memory and stored
    * query paths.
    */
  private[graft] def adistTable(index: PqIndex,
      queryVec: Seq[Double]): Array[Array[Double]] = {
    require(queryVec.length == index.m * index.subDim,
      s"query dim ${queryVec.length} != index dim ${index.m * index.subDim}")
    def l2(a: Array[Double], aOff: Int, b: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < b.length) { val t = a(aOff + i) - b(i); d += t * t; i += 1 }
      d
    }
    val qArr = queryVec.toArray
    Array.tabulate(index.m, index.ksub)((j, c) =>
      l2(qArr, j * index.subDim, index.codebook(j)(c)))
  }

  /** Query path against a pre-built [[PqIndex]] — no training jobs. */
  def pqTopKWith(index: PqIndex, embeddings: DataFrame, idCol: String,
      vecCol: String, queryVec: Seq[Double], k: Int, refine: Int = 50): DataFrame = {
    val codebook = index.codebook
    // asymmetric-distance table: query subvector vs every centroid
    val table: Array[Array[Double]] = adistTable(index, queryVec)
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

  /** A scalar-quantization (SQ8) grid: per-dimension [min, max] over the
    * corpus. The build-once artifact — at 100 TB the grid comes from one
    * partial-aggregated min/max pass (k×2 doubles on the driver) and the
    * 1-byte-per-dimension codes are written at ingest, so the candidate
    * scan reads an 8× smaller column than the float32 embeddings (4 bytes
    * per dim → 1), with no train step at all (unlike IVF/PQ).
    */
  case class Sq8Index(mins: Array[Double], maxs: Array[Double]) {
    def dim: Int = mins.length
  }

  def buildSq8Index(embeddings: DataFrame, vecCol: String): Sq8Index = {
    val rows = embeddings
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("p", "x")))
      .groupBy("p").agg(min("x").as("mn"), max("x").as("mx"))
      .collect()
    require(rows.nonEmpty, "SQ8 grid needs at least one vector")
    val dim = rows.map(_.getInt(0)).max + 1
    val mins = new Array[Double](dim)
    val maxs = new Array[Double](dim)
    rows.foreach { r => mins(r.getInt(0)) = r.getDouble(1); maxs(r.getInt(0)) = r.getDouble(2) }
    Sq8Index(mins, maxs)
  }

  /** The SQ8 code of one vector against the grid: per dimension,
    * `least(255, greatest(0, floor((x - mn) / (mx - mn) * 256)))`, or 0
    * when the dimension is constant (mx == mn). The clamp matters only
    * for out-of-grid queries (corpus values are inside by construction).
    * Codes come out as exact small integers in doubles so the quantized
    * distance below is exact integer arithmetic — bit-restatable in SQL.
    */
  private def sq8Code(vec: Column, index: Sq8Index): Column = {
    val params = array(index.mins.indices.map { i =>
      struct(lit(index.mins(i)).as("mn"),
        lit(index.maxs(i) - index.mins(i)).as("span"))
    }: _*)
    zip_with(vec.cast("array<double>"), params, (x, p) =>
      when(p.getField("span") > 0,
        least(lit(255.0), greatest(lit(0.0),
          floor((x - p.getField("mn")) / p.getField("span") * 256))))
        .otherwise(lit(0.0)))
  }

  /** Scalar-quantization ANN: quantize every vector to one byte per
    * dimension on a per-dimension min/max grid, rank candidates by exact
    * integer L2 distance between codes, keep the best `refine`, then
    * exact-cosine re-rank to top-`k` — the simplest member of the ANN
    * family (brute / LSH / IVF / PQ / SQ8): no training, near-lossless
    * recall at 8× less scan I/O.
    *
    * The quantized distance is computed as `c·c − 2·c·q + q·q` with the
    * native codegen'd dot kernel — every term is a sum of products of
    * integers ≤ 255² over the dimension count, far inside double's exact
    * range, so candidate ranking is deterministic and the DuckDB oracle
    * can restate it as a literal Σ(cᵢ−qᵢ)². Ties break on the id.
    */
  def sq8TopK(embeddings: DataFrame, idCol: String, vecCol: String,
      queryVec: Seq[Double], k: Int, refine: Int = 50): DataFrame =
    sq8TopKWith(buildSq8Index(embeddings, vecCol),
      embeddings, idCol, vecCol, queryVec, k, refine)

  /** Query path against a pre-built [[Sq8Index]] — no grid pass. */
  def sq8TopKWith(index: Sq8Index, embeddings: DataFrame, idCol: String,
      vecCol: String, queryVec: Seq[Double], k: Int, refine: Int = 50): DataFrame = {
    require(queryVec.length == index.dim,
      s"query dim ${queryVec.length} != grid dim ${index.dim}")
    // query code on the driver — same formula as sq8Code
    val qCode: Array[Double] = queryVec.indices.map { i =>
      val span = index.maxs(i) - index.mins(i)
      if (span > 0)
        math.min(255.0, math.max(0.0,
          math.floor((queryVec(i) - index.mins(i)) / span * 256)))
      else 0.0
    }.toArray
    val qq = qCode.map(c => c * c).sum
    val qCol = array(qCode.map(lit): _*)
    val q = array(queryVec.map(lit): _*)
    embeddings
      .withColumn("_code", sq8Code(col(vecCol), index))
      .withColumn("_qd",
        dot(col("_code"), col("_code")) - lit(2.0) * dot(col("_code"), qCol) + lit(qq))
      .orderBy(col("_qd").asc, col(idCol))
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

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    * k-means-cluster the embeddings, then prune near-duplicates ONLY
    * within each cluster — the all-pairs comparison shrinks from O(n²)
    * to Σ|cluster|², which is what makes embedding dedup tractable on a
    * 100 TB corpus (clusters are small relative to the corpus, and the
    * per-cluster pair joins are co-partitioned by the cluster id, so the
    * whole prune is one shuffle on `cid`). Cross-cluster duplicates are
    * out of reach by design — that is the published trade-off.
    *
    * Deterministic end to end: centroids from [[trainCentroids]]
    * (fixed-point means, first-k seed), assignment via the codegen'd
    * NearestCentroid kernel, and the drop rule is "b is a duplicate iff
    * some a < b in the same cluster has cosine(a, b) > threshold" — no
    * randomness, fully restatable in SQL for the oracle gate.
    *
    * Returns the KEPT rows as (idCol, cid). At real scale `nCentroids`
    * grows with the corpus (≈ n/1000) so cluster sizes stay bounded.
    */
  def semDedup(embeddings: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nCentroids: Int = 16, trainIters: Int = 2): DataFrame = {
    val cents = trainCentroids(embeddings, idCol, vecCol, nCentroids, trainIters)
    val assigned = embeddings.select(col(idCol),
      col(vecCol).cast("array<double>").as("_v"),
      graft.functions.VectorFunctions.nearestCentroid(col(vecCol), cents).as("cid"))
    val a = assigned.select(col("cid"), col(idCol).as("_a"), col("_v").as("_va"))
    val b = assigned.select(col("cid"), col(idCol).as("_b"), col("_v").as("_vb"))
    val dups = a.join(b, "cid").filter(col("_a") < col("_b"))
      .filter(cosine(col("_va"), col("_vb")) > threshold)
      .select(col("_b").as(idCol)).distinct()
    assigned.join(dups, Seq(idCol), "left_anti").select(col(idCol), col("cid"))
  }
}
