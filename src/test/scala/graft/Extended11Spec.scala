package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Decontamination invariants: a planted benchmark leak is detected with
  * exactly the right overlap count, and clean docs report zero.
  */
class Extended11Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("t16 detects a planted eval-set leak with the exact shared-shingle count") {
    import spark.implicits._
    // bench doc 0 has 12 tokens; train doc 100 copies tokens 3..10 (an
    // 8-token span => 4 distinct 5-gram shingles shared); train doc 101 is
    // disjoint vocabulary
    val bench = (1 to 12).map(i => s"b$i").mkString(" ")
    val leak = "x1 x2 " + (3 to 10).map(i => s"b$i").mkString(" ") + " x3"
    val clean = (1 to 30).map(i => s"c$i").mkString(" ")
    val docs = Seq((0L, bench), (100L, leak), (101L, clean)).toDF("doc_id", "text")

    // same pipeline as the query, over the planted corpus
    val sh = docs
      .select(col("doc_id"),
        expr("filter(split(text, ' '), w -> length(w) > 0)").as("ws"))
      .filter(size(col("ws")) >= 5)
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(5, size(ws)), " +
          "i -> array_join(slice(ws, i - 4, 5), ' ')))")).as("s"))
    val ov = sh.filter(col("doc_id") >= 20).withColumnRenamed("doc_id", "train_id")
      .join(sh.filter(col("doc_id") < 20).withColumnRenamed("doc_id", "bench_id"), "s")
      .groupBy("bench_id", "train_id").agg(count(lit(1)).as("overlap"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(ov == Map((0L, 100L) -> 4L))
  }

  test("t16 report covers every benchmark doc, zeros included") {
    val out = SparkEntry.queries("t16_contamination")(spark, sf).collect()
    assert(out.length == 20)
    assert(out.map(_.getLong(0)).toSeq == (0L until 20L))
    // totals are consistent: max <= total, and n=0 implies both zero
    out.foreach { r =>
      val (n, mx, tot) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(mx <= tot && (n > 0 || (mx == 0 && tot == 0)))
    }
  }
}
