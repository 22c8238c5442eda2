package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewOps

/** The scale patterns must be both correct and visible in the plan:
  * salting preserves aggregate values, bucketing removes the join
  * exchange, IVF keeps recall.
  */
class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("salted aggregation equals plain aggregation on a skewed key") {
    val li = Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
    val salted = SkewOps.saltedAgg(li, "l_returnflag", Some("l_quantity"),
        salts = 8, saltSource = col("l_orderkey"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
    val plain = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("total"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
    assert(salted.sameElements(plain))
  }

  test("salted join equals plain join") {
    val li = Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
    val sup = Tables.t(spark, "/root/testdata/sf0.001", "supplier")
      .withColumnRenamed("s_suppkey", "l_suppkey")
    val salted = SkewOps.saltedJoin(li, sup, "l_suppkey", salts = 4,
      bigSaltSource = col("l_orderkey"))
    val plain = li.join(sup, "l_suppkey")
    assert(salted.count() == plain.count())
    val a = salted.groupBy("s_name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = plain.groupBy("s_name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val li = Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
    val or = Tables.t(spark, "/root/testdata/sf0.001", "orders")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS or_b")
    // a previous JVM's in-memory catalog is gone but its warehouse dirs
    // survive → LOCATION_ALREADY_EXISTS unless cleared
    Seq("li_b", "or_b").foreach { t =>
      graft.store.GraphPackage.deleteRecursive(
        java.nio.file.Paths.get(new java.net.URI(wh).getPath, t))
    }
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    or.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("or_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("li_b").join(spark.table("or_b"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(j.count() == li.count()) // every lineitem has its order
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("band join equals the theta join and plans no nested-loop join") {
    val sup = Tables.t(spark, "/root/testdata/sf0.001", "supplier")
    val cust = Tables.t(spark, "/root/testdata/sf0.001", "customer")
    val banded = graft.operators.BandJoin.join(sup, cust, "s_acctbal", "c_acctbal", 10.0)
    val theta = sup.join(cust, abs(col("s_acctbal") - col("c_acctbal")) <= 10.0)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("s_suppkey", "c_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(key(banded) == key(theta))
    // the point of the operator: an equi-join on the bucket id, never a
    // cartesian/nested-loop scan of |L|x|R|
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"band join fell back to a nested-loop plan:\n$plan")
    assert(key(theta).nonEmpty)
  }

  test("trained IVF centroids beat first-k seeds on a clustered corpus") {
    import spark.implicits._
    val dim = 16
    // 8 well-separated cluster directions with small deterministic jitter;
    // ids 1..8 all sit in cluster 0, so the first-k seed is pathological
    // (every untrained centroid points the same way) while the corpus is
    // evenly spread — exactly the distribution mismatch k-means fixes
    def vec(cluster: Int, j: Int): Array[Float] = {
      val v = Array.fill(dim)(0.0f)
      v(cluster * 2) = 1.0f
      (0 until dim).foreach { p =>
        v(p) += java.lang.Math.floorMod(
          graft.functions.Hashing.splitmix64(cluster * 7919L + j * 17L + p), 100L) / 1000.0f
      }
      v
    }
    val rows = (1 to 8).map(id => (id.toLong, vec(0, id))) ++
      (9 to 208).map(id => (id.toLong, vec(id % 8, id)))
    val df = rows.toDF("vec_id", "embedding")
    val qv = vec(5, 999).map(_.toDouble)
    val brute = graft.llm.Similarity.bruteForceTopK(df, "vec_id", "embedding",
        qv.toSeq, 10)
      .collect().map(_.getLong(0)).toSet
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    // (recall@10, probe-stage corpus fraction, quantization objective =
    // mean cosine of each vector to its assigned centroid). The objective
    // is the quantity Lloyd optimizes and the one that generalizes: on
    // this toy corpus ANY 8 distinct centroids act as a consistent
    // cluster hash (so recall alone cannot expose a bad seed), but a
    // low objective means buckets do not track the distribution — which
    // at real scale is exactly what collapses the recall/selectivity
    // trade-off.
    def stats(iters: Int): (Double, Double, Double) = {
      val got = graft.llm.Similarity.ivfTopK(df, "vec_id", "embedding", qv.toSeq, 10,
          nCentroids = 8, nProbe = 2, trainIters = iters)
        .collect().map(_.getLong(0)).toSet
      val cents = graft.llm.Similarity.trainCentroids(df, "vec_id", "embedding", 8, iters)
      val probes = cents.zipWithIndex.sortBy { case (c, i) => (-cos(qv, c), i) }
        .take(2).map(_._2).toSet
      val vecsAndCids = df.select(col("embedding").cast("array<double>"),
          graft.functions.VectorFunctions.nearestCentroid(col("embedding"), cents))
        .collect().map(r => (r.getSeq[Double](0).toArray, r.getInt(1)))
      (brute.intersect(got).size.toDouble / brute.size,
        vecsAndCids.count(vc => probes(vc._2)).toDouble / vecsAndCids.length,
        vecsAndCids.map(vc => cos(vc._1, cents(vc._2))).sum / vecsAndCids.length)
    }
    val (trainedRecall, trainedFrac, trainedObj) = stats(2)
    val (_, _, untrainedObj) = stats(0)
    // the build-once index path must answer identically to the one-call
    // form (train once at index build, query many times with no training)
    val idx = graft.llm.Similarity.buildIvfIndex(df, "vec_id", "embedding",
      nCentroids = 8, trainIters = 2)
    val viaIndex = graft.llm.Similarity.ivfTopKWith(idx, df, "vec_id", "embedding",
        qv.toSeq, 10, nProbe = 2)
      .collect().map(_.getLong(0)).toSeq
    val viaOneCall = graft.llm.Similarity.ivfTopK(df, "vec_id", "embedding",
        qv.toSeq, 10, nCentroids = 8, nProbe = 2, trainIters = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(viaIndex == viaOneCall)
    // trained: high recall AND real pruning (2 of 8 balanced buckets)
    assert(trainedRecall >= 0.9, s"trained recall too low: $trainedRecall")
    assert(trainedFrac <= 0.4,
      s"trained IVF should prune to ~nProbe/nCentroids of the corpus, scanned $trainedFrac")
    // the all-in-one-cluster seed leaves every other cluster far from its
    // centroid; two Lloyd iterations must tighten the quantization a lot
    assert(trainedObj > untrainedObj + 0.1,
      s"training should tighten quantization: trained=$trainedObj untrained=$untrainedObj")
  }

  test("IVF ANN recall vs brute force") {
    val e = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val qv = e.filter(col("vec_id") === 0).select("embedding")
      .head.getSeq[Float](0).map(_.toDouble)
    val rest = e.filter(col("vec_id") =!= 0)
    val brute = graft.llm.Similarity.bruteForceTopK(rest, "vec_id", "embedding", qv, 10)
      .collect().map(_.getLong(0)).toSet
    val ivf = graft.llm.Similarity.ivfTopK(rest, "vec_id", "embedding", qv, 10,
        nCentroids = 16, nProbe = 6)
      .collect().map(_.getLong(0)).toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall $recall; ivf=$ivf brute=$brute")
  }
}
