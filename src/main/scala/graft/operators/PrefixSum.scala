package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level distributed prefix sums over a value-ordered histogram —
  * the cumulative-sum sibling of [[Selection]]'s rank selection.
  *
  * Cumulative statistics over an ordered domain (ECDFs for a KS test,
  * ranks-below for a Mann–Whitney AUC, vocabulary growth curves) are
  * classically written as `sum(n) OVER (ORDER BY v)` — which Spark
  * executes as a SINGLE-PARTITION window: every histogram row funnels
  * through one reducer no matter how many executors exist. This operator
  * restates the window as the textbook two-level scan:
  *
  *   1. bucket the domain (`floor(v / width)`) — any positive width is
  *      sound, because IEEE division by a positive constant and `floor`
  *      are both monotone, so bucket order agrees with value order and
  *      equal values land in equal buckets;
  *   2. per-bucket partial sums: a fully parallel hash aggregate;
  *   3. an exclusive running total over the BUCKET SUMMARIES (one row
  *      per bucket — domain/width rows, sf-invariant) gives each bucket
  *      the mass strictly before it;
  *   4. an inclusive running total INSIDE each bucket, partitioned BY
  *      bucket — parallel across buckets, ≤ width rows per reducer.
  *
  * cum(v) = bucket_prefix(bucket(v)) + within_bucket_cum(v). Per-reducer
  * row counts drop from O(D) to O(D/width + width) — ~2·√D at
  * width ≈ √D — with bit-identical results to the naive window for
  * integral inputs (sums are reassociated, so keep the summed columns
  * integral; the callers in this repo all do).
  *
  * Input contract: `hist` has ONE row per (groupCols, valCol) — i.e. it
  * is already a histogram (aggregate first). NULL values are the
  * caller's problem (filter them; cumulative rank of NULL is undefined).
  */
object PrefixSum {

  /** Appends, for each name `c` in `sumCols`, `cum_c` (inclusive
    * cumulative sum of `c` in ascending `valCol` order within each
    * group) and `pre_c` (exclusive — the mass strictly before this
    * value). Output keeps all input columns.
    */
  def cumSum(hist: DataFrame, valCol: String, sumCols: Seq[String],
      groupCols: Seq[String] = Nil, bucketWidth: Double = 4096.0): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(sumCols.nonEmpty, "need at least one column to accumulate")
    val g = groupCols.map(col)
    val binned = hist.withColumn("_b",
      floor(col(valCol).cast("double") / lit(bucketWidth)).cast("long"))

    // level 1: per-(group, bucket) partial sums — parallel hash agg
    val aggs = sumCols.map(c => sum(c).as(s"_s_$c"))
    val partials = binned.groupBy(g :+ col("_b"): _*).agg(aggs.head, aggs.tail: _*)
    val byG = if (groupCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(g: _*)
    // exclusive prefix per bucket over the tiny bucket-summary relation
    val bucketPrev = partials.select(
      g ++ Seq(col("_b")) ++ sumCols.map { c =>
        (sum(s"_s_$c").over(byG.orderBy("_b")) - col(s"_s_$c")).as(s"_p_$c")
      }: _*)

    // level 2: inclusive running total inside each bucket (parallel
    // across buckets), offset by the bucket's exclusive prefix
    val byBucket = Window.partitionBy(g :+ col("_b"): _*).orderBy(valCol)
    val joined =
      if (groupCols.isEmpty) binned.join(broadcast(bucketPrev), Seq("_b"))
      else binned.join(broadcast(bucketPrev), groupCols :+ "_b")
    joined.select(
      joined.columns.filterNot(c => c == "_b" || c.startsWith("_p_")).map(col) ++
        sumCols.flatMap { c =>
          val inc = col(s"_p_$c") + sum(c).over(byBucket)
          Seq(inc.as(s"cum_$c"), (inc - col(c)).as(s"pre_$c"))
        }: _*)
  }
}
