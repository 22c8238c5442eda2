package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Band (range) join: pairs where |left.lcol - right.rcol| <= width.
  *
  * A naive theta join (`abs(l - r) <= w`) has no equality key, so Spark
  * plans a broadcast-nested-loop / cartesian product — O(|L|·|R|) row visits
  * that no cluster survives at 100 TB. Bucketizing both sides onto a
  * `width`-sized grid turns it into an equi-join: a left row in bucket b can
  * only match right rows in nearby buckets, so the left side is duplicated
  * onto a constant, data-independent set of buckets and the join key is the
  * bucket id. The exact predicate then refines the candidates. One hash
  * shuffle on the bucket id; AQE handles bucket skew.
  *
  * The reference never implemented its planned spatial join
  * (`TODO.md:49-61`); this is the 1-D form of the same grid-bucket design
  * used by `graft.spatial.Spatial.planarProximityJoin`.
  */
object BandJoin {

  /** @param lcol numeric column on `left`; must not collide with `rcol`
    * @param rcol numeric column on `right`
    * @param width maximum absolute difference (inclusive)
    */
  def join(left: DataFrame, right: DataFrame, lcol: String, rcol: String,
      width: Double): DataFrame = {
    require(width > 0, s"band width must be positive, got $width")
    require(lcol != rcol,
      "band columns must have distinct names (rename one side)")
    val bucket = (c: String) => floor(col(c) / width).cast("long")
    // each left row lands on five distinct buckets and each right row on
    // one, so a qualifying pair meets exactly once — no dedup needed. In
    // exact arithmetic ±1 suffices (|l-r| <= w pins r/w to [l/w - 1,
    // l/w + 1]), but the refine predicate evaluates |l-r| in floating
    // point: a subtraction that rounds down to exactly `width` can accept
    // a pair whose buckets are 2 apart (l on a bucket boundary, r an ulp
    // below the boundary one width away). ±2 covers every pair the
    // floating-point predicate can accept; the cost is a constant 5×
    // duplication of the exploded side, still data-independent.
    val lb = left.withColumn("_band",
      explode(array(bucket(lcol) - 2, bucket(lcol) - 1, bucket(lcol),
        bucket(lcol) + 1, bucket(lcol) + 2)))
    val rb = right.withColumn("_band", bucket(rcol))
    lb.join(rb, "_band")
      .filter(abs(col(lcol) - col(rcol)) <= width)
      .drop("_band")
  }
}
