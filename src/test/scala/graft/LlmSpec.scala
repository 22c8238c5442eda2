package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Dedup, Multimodal, Similarity, Text}

/** Behavioral checks for the sketch/UDF-based LLM ops that have no SQL
  * oracle: planted near-duplicates must be found, LSH ANN must agree with
  * brute force, language ID must label obvious text correctly.
  */
class LlmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val baseDoc = "the quick brown fox jumps over the lazy dog and runs far away " +
    "into the deep green forest while birds sing in the morning light"

  lazy val docs = Seq(
    (1L, baseDoc),
    (2L, baseDoc), // exact duplicate of 1
    (3L, baseDoc.replace("morning", "evening")), // near-dup of 1
    (4L, "completely different content about spark sql engines and columnar storage formats"),
    (5L, "der schnelle braune fuchs springt über den faulen hund und ist nicht müde")
  ).toDF("doc_id", "text")

  test("exact dedup keeps one representative per duplicate group") {
    val kept = Dedup.exact(docs, "doc_id", "text").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L, 5L))
  }

  test("minhash LSH finds planted exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("minhash signature approximates jaccard: identical docs share all hashes") {
    val sigs = docs.select(col("doc_id"),
        Dedup.minhashSignature(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    val agree13 = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    val agree14 = sigs(1L).zip(sigs(4L)).count { case (a, b) => a == b }
    assert(agree13 > 40, s"near-dup should agree on most hashes, got $agree13/64")
    assert(agree14 < 10, s"unrelated should rarely agree, got $agree14/64")
  }

  test("simhash: hamming(near-dup) small, hamming(unrelated) large; banding finds pairs") {
    val sigs = docs.select(col("doc_id"), Dedup.simhashUdf(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(2L)) == 0)
    assert(ham(sigs(1L), sigs(3L)) <= 6)
    assert(ham(sigs(1L), sigs(4L)) > 10)
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text", maxDist = 6)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
  }

  test("simhash banding rejects maxDist beyond the pigeonhole guarantee") {
    // 16 bands of a 64-bit signature guarantee recall only for maxDist <= 15;
    // clamping silently would drop qualifying pairs with no error
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDups(docs, "doc_id", "text", maxDist = 16)
    }
  }

  test("near-dup dedup pipeline keeps one representative per cluster plus singletons") {
    val kept = Dedup.dedupNear(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // docs 1,2,3 form one near-dup cluster (rep = 1); 4 and 5 are unpaired
    assert(kept == Set(1L, 4L, 5L))
  }

  test("ngram jaccard: exact dup = 1.0, near-dup high, unrelated ~0") {
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(jac((1L, 2L)) == 1.0)
    assert(jac((1L, 3L)) > 0.8)
    assert(!jac.contains((1L, 4L)) || jac((1L, 4L)) < 0.1)
  }

  test("ngram jaccard top-k kernel equals the sorted-and-limited all-pairs result") {
    val docs500 = TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    for (k <- Seq(1, 20, 100)) {
      val full = key(Dedup.ngramJaccardPairs(docs500, "doc_id", "text", 2)
        .orderBy(round(col("jaccard"), 4).desc, col("a"), col("b")).limit(k))
      val fast = key(Dedup.ngramJaccardTopK(docs500, "doc_id", "text", k, 2))
      assert(fast == full, s"k=$k mismatch")
    }
  }

  test("ngram jaccard top-k doc-count gate falls back to the distributed join") {
    // a corpus over the doc-count bound must route to the inverted-index
    // join even when the vocab is tiny (the kernel's collect would be
    // unbounded driver memory at real doc counts) — and the fallback must
    // produce the identical top-k
    val docs500 = TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val viaKernel = key(Dedup.ngramJaccardTopK(docs500, "doc_id", "text", 20, 2))
    val viaFallback = key(Dedup.ngramJaccardTopK(docs500, "doc_id", "text", 20, 2,
      maxKernelDocs = 10L))
    assert(viaFallback == viaKernel)
  }

  test("ngram jaccard top-k prune survives randomized corpora (ties, subsets, dups)") {
    // adversarial shapes for the size-ascending length-filter break: exact
    // duplicates (jac 1.0 ties), strict subsets (jac == |A|/|B|, the prune
    // bound itself), disjoint docs, empty-ish docs — across random sizes
    val rnd = new scala.util.Random(42)
    val vocab = Vector("ab", "cd", "ef", "gh", "ij", "kl", "mn", "op")
    for (trial <- 1 to 5) {
      val n = 20 + rnd.nextInt(30)
      val docs = (0L until n.toLong).map { i =>
        val len = 2 + rnd.nextInt(10)
        val words = Seq.fill(len)(vocab(rnd.nextInt(vocab.size)))
        val text: String = rnd.nextInt(4) match {
          case 0 if i > 0 => null // real null rows reach the kernels
          case 1 => words.take(3).mkString(" ") // short → subset-prone
          case _ => words.mkString(" ")
        }
        (i, text)
      }.toDF("doc_id", "text")
      def key(df: org.apache.spark.sql.DataFrame) = df
        .select(col("a"), col("b"), round(col("jaccard"), 4).as("j"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      for (k <- Seq(1, 7, 50)) {
        val full = key(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2)
          .orderBy(round(col("jaccard"), 4).desc, col("a"), col("b")).limit(k))
        val fast = key(Dedup.ngramJaccardTopK(docs, "doc_id", "text", k, 2))
        assert(fast == full, s"trial=$trial k=$k mismatch")
      }
      // null text must hash like empty text (all-MaxValue signature), not
      // null — every doc, null included, gets all 16 LSH bands
      val buckets = Dedup.lshBuckets(docs, "doc_id", "text")
      assert(buckets.filter(col("bucket").isNull).isEmpty)
      assert(buckets.count() == n * 16L)
    }
  }

  test("LSH ANN top-k has high recall vs brute force on real embeddings") {
    val e = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val qv = e.filter(col("vec_id") === 0).select("embedding")
      .head.getSeq[Float](0).map(_.toDouble)
    val rest = e.filter(col("vec_id") =!= 0)
    val brute = Similarity.bruteForceTopK(rest, "vec_id", "embedding", qv, 10)
      .collect().map(_.getLong(0)).toSet
    val lsh = Similarity.lshTopK(rest, "vec_id", "embedding", qv, 10, qv.length,
        nBits = 16, maxBitDiff = 8)
      .collect().map(_.getLong(0)).toSet
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall too low: lsh=$lsh brute=$brute")
  }

  test("language ID labels clearly-marked text") {
    val out = Seq(
      "the cat and the dog went to the park for a walk and it is warm",
      "der hund ist nicht müde und ich gehe mit dem hund zu dir",
      "el perro es un animal y la casa es de los gatos por ahora",
      "le chat est une belle créature et je ne vais pas au parc pour rien",
      "今天天气很好我们去公园散步吧然后回家吃饭"
    ).toDF("text").select(Text.langId(col("text"))).collect().map(_.getString(0))
    assert(out.toSeq == Seq("en", "de", "es", "fr", "zh"))
  }

  test("quality score rewards normal text, punishes degenerate text") {
    val rows = Seq("the quick brown fox jumps over the lazy dog near the river bank",
      "a", "!!! ??? ... ;;; :::").toDF("text")
      .select(Text.qualityScore(col("text"))).collect().map(_.getDouble(0))
    assert(rows(0) >= 0.9)
    assert(rows(1) <= 0.4)
    assert(rows(2) <= 0.3)
  }

  test("multimodal: real PNG encode/decode roundtrip, frame plan, resize") {
    val media = Multimodal.synthesizeImages(docs, "doc_id")
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 5)
    assert(feats.map(_.getAs[Long]("media_id")).toSet == Set(1L, 2L, 3L, 4L, 5L))
    feats.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val w = Multimodal.synthWidth(id)
      val h = Multimodal.synthHeight(id)
      // real decode: dimensions and channel count come from the decoded
      // image, and PNG being lossless the decoded channel means must
      // EXACTLY equal the means of the generation stream — a stub or a
      // lossy roundtrip cannot satisfy this
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      assert(r.getAs[Int]("channels") == 3)
      val f = r.getSeq[Double](r.fieldIndex("features"))
      assert(f.length == 4)
      val vals = Array.tabulate(w * h * 3)(i => Multimodal.synthPixel(id, i).toLong)
      val n = (w * h).toLong
      assert(f(0) == vals.sum.toDouble / (n * 3) / 255.0)
      assert(f(1) == vals.indices.filter(_ % 3 == 0).map(vals).sum.toDouble / n / 255.0)
      assert(f(3) == vals.indices.filter(_ % 3 == 2).map(vals).sum.toDouble / n / 255.0)
    }
    // undecodable bytes degrade to a zero row, not a task failure
    val textMedia = Multimodal.asMedia(docs, "doc_id", "text", "text/plain")
    assert(Multimodal.extractFeatures(textMedia).collect()
      .forall(r => r.getAs[Int]("width") == 0 && r.getAs[Int]("channels") == 0))

    // the decoder is format-agnostic ImageIO: JPEG bytes decode too
    // (dimensions/channels survive lossy compression even though pixel
    // values do not — only PNG gets the exact-mean treatment above)
    val jpegBytes = {
      val img = new java.awt.image.BufferedImage(7, 5,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 5).foreach(y => (0 until 7).foreach(x =>
        img.setRGB(x, y, (x * 40 << 16) | (y * 50 << 8) | 128)))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", baos)
      baos.toByteArray
    }
    val (jw, jh, jc, jf) = Multimodal.decodeImage(jpegBytes)
    assert(jw == 7 && jh == 5 && jc == 3)
    assert(jf.forall(v => v >= 0.0 && v <= 1.0))

    val withDur = media.withColumn("meta", struct(col("meta.format"),
      col("meta.width"), col("meta.height"), lit(2000L).as("duration_ms")))
    val frames = Multimodal.frameSamplePlan(withDur, 500L)
    assert(frames.count() == 5 * 5) // 0,500,1000,1500,2000 per doc

    // real resize: output decodes to the target size; nearest-neighbour
    // sampling is deterministic, so repeated runs byte-match
    val resized = Multimodal.resize(media, 4, 4).collect()
    assert(resized.forall(r => r.getStruct(r.fieldIndex("meta")).getInt(1) == 4))
    resized.foreach { r =>
      val (w, h, c, _) = Multimodal.decodeImage(r.getAs[Array[Byte]]("content"))
      assert(w == 4 && h == 4 && c == 3)
    }
    val again = Multimodal.resize(media, 4, 4).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Array[Byte]]("content").toSeq).toMap
    resized.foreach { r =>
      assert(again(r.getAs[Long]("media_id")) == r.getAs[Array[Byte]]("content").toSeq)
    }
  }

  test("multimodal: real WAV encode/decode roundtrip via javax.sound") {
    val media = Multimodal.synthesizeAudio(docs, "doc_id")
    val feats = Multimodal.extractAudioFeatures(media).collect()
    assert(feats.length == 5)
    feats.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val (rate, ch, n) = (Multimodal.synthRate(id),
        Multimodal.synthAudioChannels(id), Multimodal.synthFrames(id))
      // real decode: format parameters come from the decoded WAV header,
      // and PCM being lossless the decoded amplitude stats must equal the
      // generation stream's, computed here with no codec
      assert(r.getAs[Int]("sample_rate") == rate, s"rate of $id")
      assert(r.getAs[Int]("channels") == ch, s"channels of $id")
      assert(r.getAs[Long]("n_frames") == n.toLong, s"frames of $id")
      val vals = Array.tabulate(n * ch)(i => Multimodal.synthSample(id, i).toLong)
      val f = r.getAs[scala.collection.Seq[Double]]("features")
      assert(f(0) == vals.sum.toDouble / (n * ch) / 32768.0, s"mean of $id")
      assert(f(1) == math.sqrt(
        vals.map(v => v * v).sum.toDouble / (n * ch)) / 32768.0, s"rms of $id")
      assert(f(2) == vals.indices.collect {
        case i if i % ch == 0 => vals(i)
      }.sum.toDouble / n / 32768.0, s"c0 mean of $id")
    }
    // stereo ids exist in the fixture (channel interleave is exercised)
    assert(feats.exists(_.getAs[Int]("channels") == 2))
    // non-audio bytes decode to zeros, not a task failure
    val junk = Multimodal.extractAudioFeatures(
      Multimodal.asMedia(docs, "doc_id", "text", "audio/fake")).collect()
    assert(junk.forall(r => r.getAs[Int]("sample_rate") == 0 &&
      r.getAs[scala.collection.Seq[Double]]("features").forall(_ == 0.0)))
  }
}
