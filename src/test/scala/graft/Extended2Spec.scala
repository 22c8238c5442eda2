package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the second extension batch — properties the
  * driver's oracle hash-compare can't express (bounds, completeness,
  * brute-force parity on small slices).
  */
class Extended2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"
  def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("w6 percent_rank and cume_dist stay in [0,1]; second_id null only for 1-row groups") {
    val bad = q("w6_rank_battery")
      .filter(col("pr") < 0 || col("pr") > 1 || col("cd") <= 0 || col("cd") > 1)
    assert(bad.isEmpty)
  }

  test("a10 median lies between group min and max quantity") {
    import spark.implicits._
    val li = Tables.t(spark, sf, "lineitem")
    val bounds = li.groupBy("l_returnflag")
      .agg(min("l_quantity").as("lo"), max("l_quantity").as("hi"))
    val bad = q("a10_median").join(bounds, "l_returnflag")
      .filter(col("med_qty") < col("lo") || col("med_qty") > col("hi"))
    assert(bad.isEmpty)
  }

  test("f7 array battery: n_lines matches group count, first element is the min") {
    val li = Tables.t(spark, sf, "lineitem")
    val counts = li.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"), min("l_linenumber").as("mn"))
    val bad = q("f7_array_battery").join(counts, "l_orderkey")
      .filter(col("n_lines") =!= col("n") || col("first_ln") =!= col("mn"))
    assert(bad.isEmpty)
  }

  test("e9 gap-fill emits a dense hourly grid per user with no null after first value") {
    val out = q("e9_gap_fill").cache()
    // dense: per user, rows == hours between min and max inclusive
    val span = out.groupBy("user_id").agg(
      count(lit(1)).as("rows"),
      ((unix_timestamp(max("hour")) - unix_timestamp(min("hour"))) / 3600 + 1).as("want"))
    assert(span.filter(col("rows") =!= col("want")).isEmpty)
    // forward fill: v_fill is never null (first grid hour has a value by construction)
    assert(out.filter(col("v_fill").isNull).isEmpty)
    out.unpersist()
  }

  test("e10 funnel conversions never exceed clicks") {
    val bad = q("e10_funnel").filter(col("n_conv") > col("n_clicks") || col("n_conv") < 0)
    assert(bad.isEmpty)
  }

  test("t9 stratified split samples en at a lower rate than other languages") {
    val docs = Tables.t(spark, sf, "documents")
    val tot = docs.groupBy("lang").agg(count(lit(1)).as("n"))
    val kept = q("t9_stratified_split").groupBy("lang").agg(count(lit(1)).as("k"))
    val rates = tot.join(kept, "lang")
      .select(col("lang"), (col("k") / col("n")).as("rate")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val enRate = rates("en")
    val others = rates.view.filterKeys(_ != "en").values
    // md5 nibble < '4' keeps 4/16 = 25%, < '8' keeps 50%; allow sampling noise
    assert(enRate > 0.1 && enRate < 0.4, s"en rate $enRate")
    others.foreach(r => assert(r > 0.3 && r < 0.7, s"other rate $r"))
  }

  test("v2 quantization reconstruction error is bounded by half a step") {
    // per-element |x - dq(x)| <= scale/2, so rmse <= scale/2 (64 dims)
    val docs = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"),
        ((array_max(col("embedding").cast("array<double>")) -
          array_min(col("embedding").cast("array<double>"))) / 255.0).as("scale"))
    val bad = q("v2_vector_quantize").join(docs, "vec_id")
      .filter(col("rmse") > col("scale") / 2 + 1e-9)
    assert(bad.isEmpty)
  }

  test("j9 triangle count matches brute-force on the same edge set") {
    import spark.implicits._
    val li = Tables.t(spark, sf, "lineitem").filter(col("l_linenumber") <= 5)
      .select("l_orderkey", "l_partkey")
    val pairs = li.as("x").join(li.as("y"), Seq("l_orderkey"))
      .filter(col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .distinct().as[(Long, Long)].collect()
    val adj = pairs.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val brute = pairs.iterator.map { case (a, b) =>
      adj.getOrElse(a, Set.empty).count(c => b < c && adj.getOrElse(b, Set.empty).contains(c))
    }.sum
    val got = q("j9_triangles").head.getLong(0)
    assert(got == brute, s"graphx=$got brute=$brute")
  }
}
