package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators — exact and near-duplicate — designed so the
  * shuffle key is always a short digest/bucket, never the document text.
  *
  *  - exact: hash-groupBy on the canonical fingerprint;
  *  - MinHash+LSH: shingle → minhash signature → band buckets → bucket
  *    join; candidate pairs verified with exact Jaccard. O(n·sig) + skew-free
  *    bucket join instead of O(n²);
  *  - SimHash: 64-bit signature; near-dup = small Hamming distance, found
  *    via band partitioning of the signature;
  *  - n-gram Jaccard: explode distinct shingles + self-join (the exact
  *    baseline the sketches approximate).
  */
object Dedup {

  /** Word n-gram shingles (distinct, order-free set) — codegen-friendly. */
  def shingles(text: Column, n: Int): Column = {
    val ws = Text.tokens(text)
    val k = size(ws)
    if (n <= 1) array_distinct(ws)
    else array_distinct(zip_with(
      slice(ws, lit(1), greatest(k - (n - 1), lit(0))),
      slice(ws, lit(n), greatest(k - (n - 1), lit(0))),
      // join first and last word of the window with the count — cheap and
      // distinctive enough for shingling; full n-word join for n == 2
      (a, b) => concat_ws(" ", a, b)))
  }

  /** Keep one representative per exact-duplicate group (min id wins). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(Text.fingerprint(col(textCol)))
    df.withColumn("_keep", min(col(idCol)).over(w))
      .filter(col(idCol) === col("_keep"))
      .drop("_keep")
  }

  /** MinHash signature as an array<long> of `numHashes` values over word
    * `shingleN`-grams. Hash family: h_i(x) = (a_i * x + b_i) mod p over a
    * 32-bit base hash of the shingle (low 32 bits of
    * splitmix64∘polyHash — deterministic across runs and bit-exactly
    * replicable in the SQL oracle).
    *
    * Single-pass native expression on purpose: the expression-tree form
    * (numHashes × array_min(transform(...))) re-traverses the shingle
    * array per hash function and per downstream band reference — measured
    * 100×+ slower at sf0.1. One shingle scan updating all minima is the
    * per-row optimum, and the Catalyst `MinHashSig` form keeps it inside
    * whole-stage codegen (no ScalaUDF plan break or boxing).
    */
  def minhashSignature(text: Column, numHashes: Int = 64, shingleN: Int = 2): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.MinHashSig(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text.cast("string")),
        numHashes, shingleN))

  /** The (a_i, b_i) affine-hash coefficient family — shared between the
    * Scala signature computation and the SQL oracle builder so the two
    * cannot drift.
    */
  private[graft] def hashCoeffs(numHashes: Int): (Array[Long], Array[Long]) = (
    Array.tabulate(numHashes)(i =>
      2L * (deterministicCoeff(2 * i) % (1L << 28)) + 1), // odd, < 2^29
    Array.tabulate(numHashes)(i => deterministicCoeff(2 * i + 1) % (1L << 29)))

  /** Delegates to the single shared kernel behind the Catalyst
    * `MinHashSig` expression — one loop, so the expression and this
    * oracle-builder entry point cannot drift bit-wise.
    */
  private[graft] def minhashSignatureScala(
      text: String, numHashes: Int, shingleN: Int): Array[Long] =
    graft.functions.MinHashKernel.computeRaw(text, numHashes, shingleN)

  /** Scala mirror of [[shingles]] (same distinct word n-gram sets). */
  private[graft] def shinglesScala(text: String, n: Int): Set[String] = {
    if (text == null) return Set.empty
    val ws = text.trim.split("\\s+").filter(_.nonEmpty)
    if (n <= 1) ws.toSet
    else if (ws.length < n) Set.empty
    else ws.indices.take(ws.length - n + 1).map(i => ws(i) + " " + ws(i + n - 1)).toSet
  }

  private def deterministicCoeff(i: Int): Long =
    math.abs(graft.functions.Hashing.splitmix64(i.toLong)) % 4294967296L

  /** LSH band buckets: signature split into `bands` rows of `r` values,
    * each hashed to one bucket id. Docs sharing any band bucket are
    * candidates. Returns (id, band, bucket).
    */
  /** Bucket id = polyHash of "band_sig1,sig2,..." — an 8-byte shuffle key
    * like xxhash64 would give, but exactly replicable in the SQL oracle.
    */
  private def polyHashCol(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.PolyHash(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))

  def lshBuckets(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleN: Int = 2): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    // bind the signature to a column BEFORE the per-band transform: inside
    // the lambda the UDF call would be re-evaluated once per band (16× the
    // minhash work — lambda bodies are outside common-subexpression reach)
    graft.operators.Par.fanOut(df)
      .select(col(idCol), minhashSignature(col(textCol), numHashes, shingleN).as("_sig"))
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => polyHashCol(concat_ws("_", b, concat_ws(",", slice(col("_sig"), b * r + 1, lit(r)))))))
      .as(Seq("band", "bucket")))
  }

  /** Candidate near-dup pairs from LSH buckets, verified with exact word
    * `shingleN`-gram Jaccard ≥ `threshold`. The scale path: the only joins
    * are on (band, bucket) and on id.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.6, numHashes: Int = 64, bands: Int = 16,
      shingleN: Int = 2): DataFrame = {
    val buckets = lshBuckets(df, idCol, textCol, numHashes, bands, shingleN)
    // bucket-equality self-join: 2·bands·n rows per side, whole-stage
    // codegen'd SMJ. Per-reducer sort size is what degrades when the
    // shuffle partition count lags the corpus (the 4M-doc smoke measured
    // 5.4× for 4× docs at a FIXED 32 partitions; sized partitions restore
    // the linear slope — see cli dedup-smoke) — the partition count is a
    // cluster sizing knob, not an operator property. A grouped
    // collect_list-per-bucket variant was measured strictly worse at both
    // 1M and 4M docs (it trades the codegen'd sort for an un-combinable
    // 16M-group hash aggregate), so the join form stays.
    val a = buckets.toDF("a", "band", "bucket")
    val b = buckets.toDF("b", "band", "bucket")
    val cand = a.join(b, Seq("band", "bucket")).filter(col("a") < col("b"))
      .select("a", "b").distinct()
    // fanOut: the shingle-set computation is per-row CPU; a single-split
    // scan (single-row-group file) would run it on one core
    val sh = graft.operators.Par.fanOut(df.select(col(idCol), col(textCol)))
      .select(col(idCol), shingles(col(textCol), shingleN).as("sh"))
    val withSets = cand
      .join(sh.toDF("a", "sh_a"), "a")
      .join(sh.toDF("b", "sh_b"), "b")
    withSets
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .withColumn("jaccard", when(col("uni") === 0, 1.0)
        .otherwise(col("inter").cast("double") / col("uni")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** 64-bit SimHash over word unigrams (splitmix64∘polyHash word bits —
    * deterministic and bit-exactly replicable in the SQL oracle).
    */
  val simhashUdf = udf((text: String) => {
    if (text == null) 0L
    else {
      val counts = new Array[Int](64)
      text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).foreach { w =>
        val bits = graft.functions.Hashing.mixHash(w)
        var i = 0
        while (i < 64) {
          if (((bits >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
          i += 1
        }
      }
      var out = 0L
      var i = 0
      while (i < 64) { if (counts(i) > 0) out |= (1L << i); i += 1 }
      out
    }
  })

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, via band
    * partitioning of the 64-bit signature into maxDist+1 chunks: by
    * pigeonhole, any pair within `maxDist` differing bits shares at least
    * one intact band, so the join key is a short band value.
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    // pigeonhole over a 64-bit signature needs maxDist+1 non-empty bands;
    // silently clamping the band count for larger distances would break the
    // recall guarantee (qualifying pairs missed with no error)
    require(maxDist >= 0 && maxDist < 16,
      s"simhash banding supports maxDist in [0, 15] for a 64-bit signature, got $maxDist")
    val nb = maxDist + 1
    val base = 64 / nb
    val extra = 64 % nb
    val sizes = Seq.tabulate(nb)(i => base + (if (i < extra) 1 else 0))
    val starts = sizes.scanLeft(0)(_ + _).init
    val bandCols = starts.zip(sizes).map { case (st, sz) =>
      val mask = if (sz == 64) -1L else (1L << sz) - 1
      expr(s"shiftrightunsigned(sig, $st) & $mask")
    }
    val withSig = df.select(col(idCol), Dedup.simhashUdf(col(textCol)).as("sig"))
    val bands = withSig.select(col(idCol).as("id"), col("sig"),
      posexplode(array(bandCols: _*)).as(Seq("band", "val")))
    val a = bands.toDF("a", "sig_a", "band", "val")
    val b = bands.toDF("b", "sig_b", "band", "val")
    a.join(b, Seq("band", "val")).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        expr("bit_count(sig_a ^ sig_b)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Exact all-pairs word n-gram Jaccard via shingle-inverted-index join —
    * the exact baseline the sketches approximate.
    */
  def ngramJaccardPairsInverted(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 2): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("sh"))
    val inv = sh.select(col("id"), col("sh"), explode(col("sh")).as("s"))
    val pairs = inv.select(col("id").as("a"), size(col("sh")).as("na"), col("s"))
      .join(inv.select(col("id").as("b"), size(col("sh")).as("nb"), col("s")), "s")
      .filter(col("a") < col("b"))
      .groupBy("a", "b", "na", "nb")
      .agg(count(lit(1)).as("inter"))
    pairs.withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .select("a", "b", "jaccard")
  }

  /** Exact all-pairs Jaccard with a dictionary-encoded bitset per document
    * and a codegen'd AND-popcount intersection. When shingles repeat across
    * most documents (small vocabulary), the inverted-index join explodes
    * (every co-occurring pair once per shared shingle); the bitset pair
    * scan is |docs|²/2 × vocab/64 long-ops instead — measured ~50× faster
    * on the synthetic corpus.
    */
  /** Dictionary-encoded shingle bitsets: one row per document with
    * (id, bits: array<long>, n = |shingle set|). Returns the DataFrame and
    * the vocabulary size (docs with empty shingle sets are dropped — they
    * intersect nothing).
    */
  /** Returns (docBits, vocabSize, release). `release` unpersists the
    * vocabulary cache the lazy `docBits` plan still references — call it
    * only after `docBits` has been fully consumed.
    */
  private def docBitsets(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int): (DataFrame, Long, () => Unit) = {
    val sh = graft.operators.Par.fanOut(df)
      .select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("sh"))
    // Every bitset consumer gates on a ≤64k vocabulary, so the dictionary
    // is driver-bounded BY CONSTRUCTION: collect at most gate+1 distinct
    // shingles (seeing the +1 row proves "over the gate" without
    // materializing more — same trick as ngramJaccardTopK's doc gate),
    // sort driver-side, broadcast a String→index map. This replaces the
    // previous distinct → single-partition row_number window → cache →
    // broadcast join → groupBy(collect_list) pipeline: one bounded job
    // plus one ZERO-shuffle UDF pass. Jaccard is invariant to the
    // dictionary's index permutation, so the driver-side sort only needs
    // to be deterministic, not collation-identical to Spark's orderBy.
    val overGate = 65537
    val vocabArr = sh.select(explode(col("sh")).as("s")).distinct()
      .limit(overGate).collect().map(_.getString(0)).sorted
    val vocabSize = vocabArr.length.toLong
    val spark = df.sparkSession
    if (vocabSize == 0L || vocabSize >= overGate) {
      // over the kernel gate (or empty corpus): callers check vocabSize
      // and fall back to the inverted-index path before evaluating docBits
      val emptySchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", df.schema(idCol).dataType),
        org.apache.spark.sql.types.StructField("bits",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.IntegerType)))
      val empty = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), emptySchema)
      return (empty, vocabSize, () => ())
    }
    val width = math.max(((vocabSize + 63) / 64).toInt, 1)
    val bcIndex = spark.sparkContext.broadcast(vocabArr.zipWithIndex.toMap)
    val toBits = udf((shs: Seq[String]) => {
      val m = bcIndex.value
      val arr = new Array[Long](width)
      shs.foreach { s =>
        // the dictionary job and this pass re-evaluate the same source
        // plan; a shingle absent from the map means the input is
        // non-deterministic (rand()/sample()/a source that changed
        // between jobs) — fail with the contract spelled out instead of
        // a bare NoSuchElementException (ADVICE r9)
        m.get(s) match {
          case Some(i) => arr(i / 64) |= (1L << (i % 64))
          case None => throw new IllegalArgumentException(
            s"shingle '$s' is missing from the collected dictionary: " +
              "docBitsets re-evaluates its input plan, so the input must " +
              "be deterministic across jobs (no rand()/sample()/mutating " +
              "source) — materialize it first (e.g. localCheckpoint)")
        }
      }
      arr
    })
    // shingles() is array_distinct, so |sh| IS the shingle-set size the
    // jaccard denominator needs; empty-set docs intersect nothing and are
    // dropped exactly as the old explode-based plan dropped them
    val docBits = sh.filter(size(col("sh")) > 0)
      .select(col("id"), toBits(col("sh")).as("bits"),
        size(col("sh")).as("n"))
    (docBits, vocabSize, () => { bcIndex.unpersist(); () })
  }

  def ngramJaccardPairsBitset(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 2): DataFrame = {
    // the lazy result keeps the vocab broadcast alive; pairs callers
    // evaluate once and it is re-derivable, so release is left to Spark
    // here (the eager topK path below releases explicitly)
    val (docBits, vocabSize, _) = docBitsets(df, idCol, textCol, shingleN)
    require(vocabSize <= 65536,
      s"bitset path requires a dictionary-encodable vocabulary (≤ 64k " +
        s"distinct shingles), got over $vocabSize — dispatch through " +
        "ngramJaccardPairs or use ngramJaccardPairsInverted")
    val a = docBits.select(col("id").as("a"), col("bits").as("ba"), col("n").as("na"))
    val b = docBits.select(col("id").as("b"), col("bits").as("bb"), col("n").as("nb"))
    a.crossJoin(b).filter(col("a") < col("b"))
      .withColumn("inter", graft.functions.VectorFunctions.bitAndCount(col("ba"), col("bb")))
      .filter(col("inter") > 0)
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .select("a", "b", "jaccard")
  }

  /** Exact top-k document pairs by word n-gram Jaccard, ordered by
    * (jaccard rounded to 4 decimals DESC, a ASC, b ASC) — the sort the
    * dedup report queries use.
    *
    * The synthetic corpora have tiny shingle vocabularies (≈10³) where every
    * token is frequent, so candidate pruning (prefix filtering / LSH) cannot
    * cut the quadratic pair space — and a DataFrame cross join materializes
    * all O(n²) rows through the join operator just to discard everything but
    * k of them (measured ~50 s for 5k docs). Instead: broadcast the
    * dictionary-encoded bitsets (n·vocab/8 bytes), scan the upper triangle
    * in interleaved stripes — one task per stripe, so stripes cover equal
    * work — and keep a bounded per-task top-k heap; only stripes×k rows ever
    * leave the executors. O(n²·w/64) word-ops total, zero shuffle.
    *
    * This is the exact-baseline operator; at data scale where n² is
    * unpayable, [[minhashNearDups]] (LSH) is the path. Vocabularies too big
    * to dictionary-encode (> 64k) — or corpora past [[defaultMaxKernelDocs]]
    * documents, whose bitsets would not fit driver/broadcast memory —
    * fall back to the distributed inverted-index join.
    */
  /** Doc-count bound for the striped-triangle kernel: 200k docs × 8 KiB
    * bitset (64k vocab / 8) ≈ 1.6 GiB broadcast — the ceiling of what a
    * driver collect + executor broadcast can absorb. Beyond it the kernel
    * would OOM the driver regardless of vocabulary size, so the dispatch
    * gates on BOTH vocab and doc count.
    */
  val defaultMaxKernelDocs = 200000L

  def ngramJaccardTopK(df: DataFrame, idCol: String, textCol: String,
      k: Int, shingleN: Int = 2,
      maxKernelDocs: Long = defaultMaxKernelDocs): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val ordered = (pairs: DataFrame) => pairs
      .orderBy(round(col("jaccard"), 4).desc, col("a"), col("b")).limit(k)
    // the doc-count gate runs BEFORE docBitsets: a 10⁸-doc corpus with a
    // tiny vocab must never reach the collect at all. limit(gate+1).count()
    // short-circuits the scan once gate+1 rows are seen, so small corpora
    // don't pay a full extra pass just to prove they're small. A gate at
    // or beyond Int.MaxValue can't be expressed as a limit (and +1 would
    // overflow) — use the exact count instead of silently disabling the gate
    val docCount =
      if (maxKernelDocs >= Int.MaxValue - 1) df.count()
      else df.limit(maxKernelDocs.toInt + 1).count()
    if (docCount > maxKernelDocs)
      return ordered(ngramJaccardPairsInverted(df, idCol, textCol, shingleN))
    val (docBits, vocabSize, releaseVocab) = docBitsets(df, idCol, textCol, shingleN)
    if (vocabSize == 0 || vocabSize > 65536) {
      releaseVocab()
      return ordered(ngramJaccardPairsInverted(df, idCol, textCol, shingleN))
    }

    val spark = df.sparkSession
    import spark.implicits._
    val idType = docBits.schema("id").dataType
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a", idType),
      org.apache.spark.sql.types.StructField("b", idType),
      org.apache.spark.sql.types.StructField("jaccard",
        org.apache.spark.sql.types.DoubleType)))
    // dense doc index, ordered by id so index order == id order (the heap's
    // tie-break on (ia, ib) then matches the caller-visible (a, b) order);
    // everything below is collected in this one pass, so no cache survives
    // the call (repeated invocations must not accumulate executor memory).
    // For integral ids the index is assigned by a DRIVER-side sort of the
    // collected rows (one shuffle + single-partition window stage fewer);
    // other id types keep the window, whose ordering is Spark-collation
    // exact (driver String sort differs from UTF8String order on
    // non-ASCII, so strings are NOT fast-pathed).
    val integralId = idType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    val rows =
      if (integralId) {
        val collected = docBits.select("bits", "n", "id").collect()
        val sorted = collected.sortBy(r => r.get(2) match {
          case l: Long => l
          case i: Int => i.toLong
          case sh: Short => sh.toLong
          case b: Byte => b.toLong
          case null => Long.MinValue // Spark orderBy default: nulls first
        })
        sorted.iterator.zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row(i, r.get(0), r.get(1), r.get(2))
        }.toArray
      } else docBits
        .withColumn("idx", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("id")) - 1)
        .select("idx", "bits", "n", "id").collect()
    releaseVocab()
    val n = rows.length
    if (n < 2) return spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), outSchema)
    val bitsArr = new Array[Array[Long]](n)
    val nsArr = new Array[Int](n)
    val idArr = new Array[Any](n)
    rows.foreach { r =>
      val i = r.getInt(0)
      bitsArr(i) = r.getSeq[Long](1).toArray
      nsArr(i) = r.getInt(2)
      idArr(i) = r.get(3)
    }
    // size-ascending physical layout, flattened to ONE contiguous long
    // array (row p at offset p·width): the O(n²) inner scan walks memory
    // strictly linearly — no Array[Array[_]] pointer chasing — and the
    // ascending sizes power the length-filter prune below: jaccard(A,B) ≤
    // |A|/|B| when |A| ≤ |B|, so once the size ratio of a stripe row
    // against the (ever larger) inner docs drops below the kept worst, the
    // whole inner tail is unreachable and the row breaks early. The heap's
    // top-k is a total order — arrival order can't change it. rank(p)
    // recovers the id-rank for tie-breaks and output ids.
    val rank = Array.tabulate(n)(identity).sortBy(i => (nsArr(i), i))
    val width = bitsArr.iterator.map(_.length).max
    val flat = new Array[Long](n * width)
    var p0 = 0
    while (p0 < n) {
      val src = bitsArr(rank(p0))
      System.arraycopy(src, 0, flat, p0 * width, src.length)
      p0 += 1
    }
    val bcBits = spark.sparkContext.broadcast(flat)
    val bcNs = spark.sparkContext.broadcast(rank.map(nsArr))
    val bcRank = spark.sparkContext.broadcast(rank)
    val widthL = width
    val stripes = math.min(n, spark.sparkContext.defaultParallelism * 4)
    val kk = k

    val local = spark.range(0, stripes).as[Long].flatMap { s =>
      val bits = bcBits.value
      val ns = bcNs.value
      // head of the heap = worst kept pair under (rjac desc, ia, ib)
      val worstFirst = new Ordering[(Double, Int, Int, Double)] {
        def compare(x: (Double, Int, Int, Double), y: (Double, Int, Int, Double)): Int = {
          val c = java.lang.Double.compare(y._1, x._1)
          if (c != 0) c
          else {
            val c2 = Integer.compare(x._2, y._2)
            if (c2 != 0) c2 else Integer.compare(x._3, y._3)
          }
        }
      }
      val pq = scala.collection.mutable.PriorityQueue.empty[(Double, Int, Int, Double)](worstFirst)
      def round4(x: Double): Double =
        BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val rnk = bcRank.value
      val nDocs = rnk.length
      var p = s.toInt
      while (p < nDocs) {
        val ri = rnk(p)
        val ni = ns(p)
        val offI = p * widthL
        var q = p + 1
        var pruned = false
        while (q < nDocs && !pruned) {
          val nj = ns(q)
          // length filter: sizes ascend with q, so jac ≤ ni/nj here and for
          // every later q; below the kept worst (4-dp margin) ⇒ break
          if (pq.size == kk && nj > 0 && ni.toDouble / nj < pq.head._1 - 1e-4) {
            pruned = true
          } else {
          val offJ = q * widthL
          var inter = 0L
          var w = 0
          while (w < widthL) {
            inter += java.lang.Long.bitCount(bits(offI + w) & bits(offJ + w))
            w += 1
          }
          if (inter > 0) {
            val jac = inter.toDouble / (ni + nj - inter)
            // cheap reject before the BigDecimal rounding: 4-dp rounding
            // moves a value by < 5e-5, so anything 1e-4 below the kept
            // worst can never displace it
            if (pq.size < kk || jac >= pq.head._1 - 1e-4) {
              val rj = rnk(q)
              val cand = (round4(jac),
                if (ri < rj) ri else rj, if (ri < rj) rj else ri, jac)
              if (pq.size < kk) pq.enqueue(cand)
              else if (worstFirst.compare(cand, pq.head) < 0) {
                pq.dequeue(); pq.enqueue(cand)
              }
            }
          }
          }
          q += 1
        }
        p += stripes.toInt
      }
      pq.iterator.map(t => (t._2.toLong, t._3.toLong, t._4)).toSeq
    }.collect()
    // kernel done (stripes × k survivors on the driver): release the
    // broadcasts before handing back the small result
    bcBits.destroy()
    bcNs.destroy()
    bcRank.destroy()
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](local.length)
    local.foreach { case (ia, ib, jac) =>
      out.add(org.apache.spark.sql.Row(idArr(ia.toInt), idArr(ib.toInt), jac))
    }
    ordered(spark.createDataFrame(out, outSchema))
  }

  /** Duplicate-cluster resolution: near-dup pairs form a graph whose
    * connected components are duplicate clusters; GraphX CC labels every
    * member with the minimum id in its component (the representative).
    * Returns (id, cluster).
    */
  def clusters(pairs: DataFrame): DataFrame =
    // min-label CC via FastCC: forest contraction under the single-task
    // gate (near-dup pair graphs are corpus-summary-sized), the GraphX
    // Pregel fixpoint above it — identical labels either way, and the
    // result is checkpoint-materialized so no RDD cache outlives the call
    graft.graph.FastCC.labels(
      pairs.select(col("a").cast("long"), col("b").cast("long")),
      "id", "cluster")

  /** End-to-end near-duplicate removal: MinHash-LSH candidate pairs →
    * Jaccard-verified edges → connected components → keep each cluster's
    * min-id representative plus every unpaired document.
    */
  def dedupNear(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.6): DataFrame = {
    val pairs = minhashNearDups(df, idCol, textCol, threshold)
    val comp = clusters(pairs)
    df.join(comp, df(idCol) === comp("id"), "left")
      .filter(col("cluster").isNull || col("cluster") === col(idCol))
      .drop("id", "cluster")
  }

  /** [[dedupNear]] with a QUALITY-canonical representative: each cluster
    * keeps its highest-`scoreCol` member (ties → smallest id) instead of
    * its smallest id — the production dedup policy (keep the best copy,
    * not the first-crawled one). `idCol` and `scoreCol` must be numeric
    * and non-null; the per-cluster argmax is one `max(struct(score,-id))`
    * aggregation, so the selection is a single co-partitioned pass with
    * map-side partials — no window sort over cluster members.
    */
  def dedupNearKeepBest(df: DataFrame, idCol: String, textCol: String,
      scoreCol: String, threshold: Double = 0.6): DataFrame = {
    val pairs = minhashNearDups(df, idCol, textCol, threshold)
    val comp = clusters(pairs)
    val withC = df.join(comp, df(idCol) === comp("id"), "left")
      .withColumn("_cl", coalesce(col("cluster"), col(idCol)))
    val best = withC.groupBy("_cl")
      .agg(max(struct(col(scoreCol), (lit(0L) - col(idCol)).as("_nid"))).as("_b"))
      .select(col("_cl"), (lit(0L) - col("_b._nid")).as("_keep"))
    withC.join(best, "_cl")
      .filter(col(idCol) === col("_keep"))
      .drop("id", "cluster", "_cl", "_keep")
  }

  /** Adaptive exact Jaccard: bitset path when the shingle vocabulary is
    * small enough to dictionary-encode (≤ 64k), inverted-index join
    * otherwise. Both return identical (a, b, jaccard) rows; pairs with
    * empty intersections are only emitted by neither.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 2): DataFrame = {
    val sh = df.select(shingles(col(textCol), shingleN).as("sh"))
    val vocabSize = sh.select(explode(col("sh")).as("s")).distinct().count()
    if (vocabSize > 0 && vocabSize <= 65536)
      ngramJaccardPairsBitset(df, idCol, textCol, shingleN)
    else
      ngramJaccardPairsInverted(df, idCol, textCol, shingleN)
  }
}
