package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k buffer: parallel score/key arrays, kept at most 4k long
  * between trims so insertion is amortized O(1). */
case class TopKBuf(scores: Array[Double], keys: Array[Long])

/** Typed bounded top-k aggregator: keeps the k (score desc, key asc)-best
  * (score, key) pairs per group and emits the keys as a CSV string.
  *
  * The buffer is O(k) regardless of group size and `merge` is associative,
  * so Spark runs it as a partial aggregation — each map task reduces its
  * partition to k rows before the shuffle, which is what makes a top-k per
  * group safe on a 100 TB fact table (the alternative, collect_list + sort,
  * shuffles every row).
  */
class TopKAgg(k: Int) extends Aggregator[(Double, Long), TopKBuf, String] {

  private def trim(b: TopKBuf, force: Boolean): TopKBuf =
    if (!force && b.keys.length <= 4 * k) b
    else {
      val kept = b.scores.zip(b.keys).sortBy { case (s, key) => (-s, key) }.take(k)
      TopKBuf(kept.map(_._1), kept.map(_._2))
    }

  def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)

  def reduce(b: TopKBuf, a: (Double, Long)): TopKBuf =
    trim(TopKBuf(b.scores :+ a._1, b.keys :+ a._2), force = false)

  def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf =
    trim(TopKBuf(b1.scores ++ b2.scores, b1.keys ++ b2.keys), force = false)

  def finish(r: TopKBuf): String = trim(r, force = true).keys.mkString(",")

  def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]

  def outputEncoder: Encoder[String] = Encoders.STRING
}
