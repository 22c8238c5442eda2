package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Band (range) join: pairs where |left.lcol - right.rcol| <= width.
  *
  * A naive theta join (`abs(l - r) <= w`) has no equality key, so Spark
  * plans a broadcast-nested-loop / cartesian product — O(|L|·|R|) row visits
  * that no cluster survives at 100 TB. Bucketizing both sides onto a
  * `width`-sized grid turns it into an equi-join: a left row in bucket b can
  * only match right rows in buckets b-1, b, b+1, so the left side is
  * duplicated onto those three buckets (3× — constant, not data-dependent)
  * and the join key is the bucket id. The exact predicate then refines the
  * candidates. One hash shuffle on the bucket id; AQE handles bucket skew.
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
    // each left row lands on exactly three distinct buckets and each right
    // row on one, so a qualifying pair meets exactly once — no dedup needed
    val lb = left.withColumn("_band",
      explode(array(bucket(lcol) - 1, bucket(lcol), bucket(lcol) + 1)))
    val rb = right.withColumn("_band", bucket(rcol))
    lb.join(rb, "_band")
      .filter(abs(col(lcol) - col(rcol)) <= width)
      .drop("_band")
  }
}
