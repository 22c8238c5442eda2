package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{CoOrderPairs, Par}

/** r13 operator internals: the aggregate-generator pair builder that
  * replaced the broadcast self-join in j9/j28/j30/j31/r9/r13, and the
  * data-derived partition sizing that replaced the core-count pins.
  */
class CoOrderPairsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("undirected pairs equal the x<y self-join's distinct pair set") {
    val rnd = new scala.util.Random(1301)
    for (trial <- 1 to 5) {
      // orders with 0..6 parts, duplicate parts included (collect_set must
      // collapse them exactly like pair-identity did in the join form)
      val rows = (1 to 40).flatMap { ok =>
        (0 until rnd.nextInt(7)).map(_ => (ok.toLong, rnd.nextInt(12).toLong))
      }
      val li = rows.toDF("l_orderkey", "l_partkey")
      val got = CoOrderPairs.undirected(li)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = li.as("x").join(li.as("y"), Seq("l_orderkey"))
        .filter(col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
        .distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"trial=$trial")
      // a < b canonical orientation holds for every generated pair
      assert(got.forall { case (a, b) => a < b }, s"trial=$trial orientation")
    }
  }

  test("sizedPartitions derives width from rows, clamped to [1, 4×cores]") {
    val df = spark.range(1).toDF()
    val cores = spark.sparkContext.defaultParallelism
    assert(Par.sizedPartitions(df, 0L, 100000L) == 1)
    assert(Par.sizedPartitions(df, 1L, 100000L) == 1)
    assert(Par.sizedPartitions(df, 100000L, 100000L) == 1)
    assert(Par.sizedPartitions(df, 100001L, 100000L) == 2)
    assert(Par.sizedPartitions(df, 1000000L, 100000L) == math.min(10, 4 * cores))
    // the cap binds, never the core count alone
    assert(Par.sizedPartitions(df, Long.MaxValue / 2, 1L) == 4 * cores)
  }
}
