package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-45 operators against hand-computed fixtures. */
class Extended45Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("a22 MAD on a hand fixture: median and MAD both exact lower-medians") {
    import spark.implicits._
    // flag X prices: 1, 3, 5, 100 -> lower median 3; devs 2, 0, 2, 97 ->
    // sorted 0,2,2,97 -> lower median (2*cw>=tw at dv=2) = 2
    val li = Seq(("X", 0.01), ("X", 0.03), ("X", 0.05), ("X", 1.00))
      .toDF("l_returnflag", "l_extendedprice")
    val tmp = java.nio.file.Files.createTempDirectory("e45spec").toString
    li.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = graft.queries.Extended45.queries("a22_mad")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toList
    assert(out == List(("X", 0.03, 0.02)))
  }

  test("j20 longest path: local sweep == distributed frontier on a fixture DAG") {
    import spark.implicits._
    // diamond + tail: longest to 4 is 1-2-4 (len 2), to 5 is len 3
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L), (1L, 4L))
      .toDF("u", "v")
    val expected = Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(toMap(graft.route.DagPath.longestPath(spark, edges)) == expected)
    assert(toMap(graft.route.DagPath.longestPath(spark, edges,
      maxLocalEdges = 0)) == expected)
  }

  test("j20 dispatch paths agree on the sf0.001 sparse supernode DAG") {
    val d = "/root/testdata/sf0.001"
    val edges = graft.queries.Extended42.sparseSupernodeEdges(spark, d)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = toMap(graft.route.DagPath.longestPath(spark, edges))
    val dist = toMap(graft.route.DagPath.longestPath(spark, edges,
      maxLocalEdges = 0))
    assert(local == dist)
  }

  test("tp17 hard negatives never return the probe's own label") {
    val d = "/root/testdata/sf0.001"
    val out = graft.queries.Extended45.queries("tp17_hard_negatives")(spark, d)
    val labels = graft.Tables.t(spark, d, "embeddings")
      .select(col("vec_id"), col("label"))
    val joined = out
      .join(labels, "vec_id")
      .join(labels.select(col("vec_id").as("pid"), col("label").as("plabel")), "pid")
    assert(joined.filter(col("label") === col("plabel")).isEmpty)
    // 5 probes x 5 negatives
    assert(out.count() == 25)
  }
}
