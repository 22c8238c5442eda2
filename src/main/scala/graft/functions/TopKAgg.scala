package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k buffer: parallel score/key arrays. Below k elements the
  * arrays are an unordered append log; once they reach k they are
  * heapified in place (root = worst kept) and never grow again.
  */
case class TopKBuf(scores: Array[Double], keys: Array[Long])

/** Typed bounded top-k aggregator: keeps the k (score desc, key asc)-best
  * (score, key) pairs per group and emits the keys as a CSV string.
  *
  * The buffer is O(k) regardless of group size and `merge` is associative,
  * so Spark runs it as a partial aggregation — each map task reduces its
  * partition to k rows before the shuffle, which is what makes a top-k per
  * group safe on a 100 TB fact table (the alternative, collect_list + sort,
  * shuffles every row). Once a group's buffer is full, each further input
  * row costs one root comparison (plus an O(log k) in-place sift only when
  * it displaces the worst kept row) — no per-row allocation.
  */
class TopKAgg(k: Int) extends Aggregator[(Double, Long), TopKBuf, String] {

  /** (s1,k1) strictly worse than (s2,k2) under (score desc, key asc). */
  private def worse(s1: Double, k1: Long, s2: Double, k2: Long): Boolean =
    s1 < s2 || (s1 == s2 && k1 > k2)

  private def siftDown(b: TopKBuf, from: Int): Unit = {
    val n = b.scores.length
    var i = from
    var done = false
    while (!done) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < n && worse(b.scores(l), b.keys(l), b.scores(m), b.keys(m))) m = l
      if (r < n && worse(b.scores(r), b.keys(r), b.scores(m), b.keys(m))) m = r
      if (m == i) done = true
      else {
        val ts = b.scores(i); b.scores(i) = b.scores(m); b.scores(m) = ts
        val tk = b.keys(i); b.keys(i) = b.keys(m); b.keys(m) = tk
        i = m
      }
    }
  }

  private def heapify(b: TopKBuf): TopKBuf = {
    var i = b.scores.length / 2 - 1
    while (i >= 0) { siftDown(b, i); i -= 1 }
    b
  }

  def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)

  def reduce(b: TopKBuf, a: (Double, Long)): TopKBuf =
    if (b.scores.length < k) {
      val nb = TopKBuf(b.scores :+ a._1, b.keys :+ a._2)
      if (nb.scores.length == k) heapify(nb) else nb
    } else if (worse(b.scores(0), b.keys(0), a._1, a._2)) {
      b.scores(0) = a._1; b.keys(0) = a._2
      siftDown(b, 0)
      b
    } else b

  def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
    var acc = if (b1.scores.length >= b2.scores.length) b1 else b2
    val other = if (acc eq b1) b2 else b1
    var i = 0
    while (i < other.scores.length) {
      acc = reduce(acc, (other.scores(i), other.keys(i)))
      i += 1
    }
    acc
  }

  def finish(r: TopKBuf): String =
    r.scores.zip(r.keys).sortBy { case (s, key) => (-s, key) }
      .take(k).map(_._2).mkString(",")

  def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]

  def outputEncoder: Encoder[String] = Encoders.STRING
}
