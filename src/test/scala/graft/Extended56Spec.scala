package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-56: link prediction on a hand-computed graph. */
class Extended56Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("link scores count common neighbors of NON-edges only") {
    import spark.implicits._
    // square 1-2-3-4-1: diagonals (1,3) and (2,4) are the non-edges,
    // each with cn=2 and jaccard 2/(2+2-2)=1.0; all actual edges excluded
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("u", "v")
    // emulate the pipeline on a custom frame: reuse the query body via a
    // staged orders table is overkill — call the same plan pieces directly
    val sym = edges.select(col("u").as("a"), col("v").as("b"))
      .union(edges.select(col("v").as("a"), col("u").as("b")))
    val deg = sym.groupBy(col("a").as("node")).agg(count(lit(1)).as("d"))
    val cn = sym.select(col("a").as("u"), col("b").as("w"))
      .join(sym.select(col("a").as("v"), col("b").as("w")), "w")
      .filter(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("cn"))
    val out = cn.join(edges, Seq("u", "v"), "left_anti")
      .join(deg.select(col("node").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
      .select(col("u"), col("v"), col("cn"),
        round(col("cn").cast("double") /
          (col("du") + col("dv") - col("cn")), 4).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(out == Set((1L, 3L, 2L, 1.0), (2L, 4L, 2L, 1.0)))
  }
}
