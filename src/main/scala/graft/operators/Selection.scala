package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level histogram selection — exact order statistics over a
  * (group, value, count) histogram WITHOUT a per-group cumulative window
  * over the full value domain.
  *
  * The naive form (`sum(n) OVER (PARTITION BY g ORDER BY v)` then keep
  * the first qualifying row) is exact and domain-bounded, but the window
  * serializes each group's whole histogram through one reducer — with a
  * handful of groups that is a handful-way parallelism ceiling no matter
  * how many executors the cluster has. This operator replaces it with
  * the classic two-level selection:
  *
  *   1. bucket the domain (`floor(v / width)`, width a power of two so
  *      the division is exact for both integral and double values);
  *   2. per-(group, bucket) partial sums — a fully parallel hash
  *      aggregate over the histogram;
  *   3. a per-group cumulative window over the BUCKET summaries (rows ∝
  *      domain/width) locates the one bucket containing the target rank
  *      and the cumulative mass before it;
  *   4. a per-group cumulative window INSIDE that single bucket (rows ∝
  *      values per bucket) finds the exact answer.
  *
  * Per-reducer row counts drop from O(D) to O(D/width + width) — ~2·√D
  * at width ≈ √D — and both window inputs stay sf-invariant (they are
  * domain-, not row-, proportional). Selection semantics are identical
  * to the naive form: the MINIMUM value whose cumulative count reaches
  * the target, with integer-only comparisons (no float-order hazard).
  */
object Selection {

  /** min(valCol) per group such that cum(nCol) >= target(total), where
    * `target` maps the group's total count column to the wanted rank.
    * `counts` must be a histogram: one row per (group, value) with a
    * positive integral count. NULL values carry no rank (they are
    * filtered before bucketing — both selection paths agree). Emits one
    * row per group: groupCols :+ outCol.
    */
  def selectRank(counts: DataFrame, groupCols: Seq[String], valCol: String,
      nCol: String, target: Column => Column, outCol: String,
      bucketWidth: Double = 4096.0): DataFrame = {
    require(bucketWidth > 0 &&
      java.lang.Long.bitCount(math.round(bucketWidth)) == 1 &&
      math.round(bucketWidth).toDouble == bucketWidth,
      s"bucketWidth must be a positive power of two for exact division, got $bucketWidth")
    val g = groupCols.map(col)
    val binned = counts.filter(col(valCol).isNotNull).withColumn("_b",
      floor(col(valCol).cast("double") / lit(bucketWidth)).cast("long"))

    // level 1: per-bucket partial sums — parallel hash agg over the histogram
    val buckets = binned.groupBy(g :+ col("_b"): _*).agg(sum(nCol).as("_bn"))
    val byG = Window.partitionBy(g: _*)
    val bcum = buckets.select(g ++ Seq(col("_b"), col("_bn"),
      sum("_bn").over(byG.orderBy("_b")).as("_bcum"),
      sum("_bn").over(byG).as("_tw")): _*)

    // the single bucket per group whose cumulative reaches the target,
    // plus the mass strictly before it; one tiny row per group
    val picked = bcum.filter(col("_bcum") >= target(col("_tw")))
      .groupBy(g: _*).agg(min("_b").as("_mb"))
    // picked derives from bcum — alias both sides so the equi-join on the
    // group columns is unambiguous
    val joinCond = groupCols.map(n => col(s"l.$n") === col(s"r.$n"))
      .foldLeft(col("l._b") === col("r._mb"))(_ && _)
    val bucketInfo = bcum.as("l").join(broadcast(picked.as("r")), joinCond)
      .select(groupCols.map(n => col(s"l.$n")) ++ Seq(col("r._mb"),
        (col("l._bcum") - col("l._bn")).as("_prev"), col("l._tw").as("_tw")): _*)

    // level 2: cumulative selection inside the one picked bucket only
    val inBucket =
      if (groupCols.isEmpty)
        binned.crossJoin(broadcast(bucketInfo)).filter(col("_b") === col("_mb"))
      else
        binned.join(broadcast(bucketInfo), groupCols)
          .filter(col("_b") === col("_mb"))
    inBucket
      .select(g ++ Seq(col(valCol),
        (col("_prev") + sum(nCol).over(byG.orderBy(valCol))).as("_cw"),
        col("_tw")): _*)
      .filter(col("_cw") >= target(col("_tw")))
      .groupBy(g: _*).agg(min(valCol).as(outCol))
  }

  /** The lower weighted median: min v with 2·cum >= total (equivalently
    * cum >= ceil(total/2) for integral counts) — the selection rule the
    * exact-median query family (a19/a20/a22/e27) shares with its DuckDB
    * oracles.
    */
  def lowerMedian(counts: DataFrame, groupCols: Seq[String], valCol: String,
      nCol: String, outCol: String, bucketWidth: Double = 4096.0): DataFrame =
    selectRank(counts, groupCols, valCol, nCol,
      // ceil(tw/2) as pure integer arithmetic; totals are far below 2^53
      // so the intermediate double division is exact to the floor
      tw => floor((tw + lit(1L)) / lit(2L)).cast("long"), outCol, bucketWidth)

  /** Driver-assisted variant for DOMAIN-BOUNDED histograms (the a19/a22
    * family: values are cent/milli-scaled measures, so the value domain —
    * and with it the bucket count — is fixed regardless of row count).
    * Identical selection semantics to [[selectRank]], far fewer stages:
    * the two distributed passes are plain parallel aggregates (bucket
    * partial sums; then the one target bucket's rows) whose results are
    * BOUNDED artifacts — ≤ domain/width and ≤ width·groups rows — and the
    * cumulative walk over them runs on the driver, like every other
    * bounded-artifact collect in this repo (IVF centroids, SQ8 grids).
    * At 100 TB both collects are the same size as at sf0.001; only the
    * histogram aggregation underneath scales, and it is a hash agg.
    * Loud guard: collects above `maxCollect` rows abort rather than
    * silently ship an unbounded domain through the driver — use
    * [[selectRank]] for domains you cannot bound.
    *
    * `targets` maps a group's total count to one rank per wanted
    * statistic; the result has one row per (group, target): groupCols ++
    * (labelCol, outCol). Selection is "minimum value whose cumulative
    * count reaches the rank" — exactly the windowed form, restated as an
    * integer walk.
    */
  def selectRanksBounded(counts: DataFrame, groupCols: Seq[String],
      valCol: String, nCol: String, targets: Seq[(String, Long => Long)],
      labelCol: String, outCol: String, bucketWidth: Double = 4096.0,
      maxCollect: Int = 1 << 21): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    require(bucketWidth > 0 &&
      java.lang.Long.bitCount(math.round(bucketWidth)) == 1 &&
      math.round(bucketWidth).toDouble == bucketWidth,
      s"bucketWidth must be a positive power of two, got $bucketWidth")
    val spark = counts.sparkSession
    val g = groupCols.map(col)
    val binned = counts.filter(col(valCol).isNotNull).withColumn("_b",
      floor(col(valCol).cast("double") / lit(bucketWidth)).cast("long"))

    // pass 1 (distributed): per-bucket partial sums; collect the bounded
    // bucket summaries and walk them on the driver
    val bRows = binned.groupBy(g :+ col("_b"): _*)
      .agg(sum(nCol).cast("long").as("_bn")).collect()
    require(bRows.length <= maxCollect,
      s"bucket summary has ${bRows.length} rows (> $maxCollect): the value " +
        "domain is not bounded enough for driver-side selection; use selectRank")
    val nG = groupCols.length
    case class Pick(key: IndexedSeq[Any], label: String, rank: Long,
      bucket: Long, prevMass: Long)
    val picks: Seq[Pick] = bRows.groupBy(r => (0 until nG).map(r.get)).toSeq
      .flatMap { case (key, rows) =>
        val buckets = rows.map(r => (r.getLong(nG), r.getLong(nG + 1)))
          .sortBy(_._1)
        val tw = buckets.iterator.map(_._2).sum
        targets.map { case (label, target) =>
          val rank = target(tw)
          var cum = 0L; var i = 0
          while (i < buckets.length && cum + buckets(i)._2 < rank) {
            cum += buckets(i)._2; i += 1
          }
          // rank <= tw for any sane target; if not, clamp to the last bucket
          val j = math.min(i, buckets.length - 1)
          Pick(key, label, rank, buckets(j)._1, cum)
        }
      }

    // pass 2 (distributed): only the picked buckets' histogram rows —
    // ≤ width distinct values per (group, target)
    val wanted = picks.map { p =>
      groupCols.zip(p.key).map { case (c, kv) => col(c) <=> lit(kv) }
        .foldLeft(col("_b") === lit(p.bucket))(_ && _)
    }.reduceOption(_ || _).getOrElse(lit(false))
    val inRows = binned.filter(wanted)
      .select(g ++ Seq(col("_b"), col(valCol), col(nCol).cast("long")): _*)
      .collect()
    require(inRows.length <= maxCollect,
      s"picked buckets hold ${inRows.length} rows (> $maxCollect); shrink " +
        "bucketWidth or use selectRank")
    val valByKey = inRows.groupBy(r => ((0 until nG).map(r.get), r.getLong(nG)))

    val ord: Ordering[Any] = counts.schema(valCol).dataType match {
      case LongType => Ordering.by(v => v.asInstanceOf[Long])
      case IntegerType => Ordering.by(v => v.asInstanceOf[Int].toLong)
      case DoubleType => Ordering.by(v => v.asInstanceOf[Double])
      case t => sys.error(s"selectRanksBounded: unsupported value type $t")
    }
    val out: Seq[Row] = picks.map { p =>
      val rows = valByKey.getOrElse((p.key, p.bucket), Array.empty)
        .map(r => (r.get(nG + 1), r.getLong(nG + 2)))
        .sortBy(_._1)(ord)
      var cum = p.prevMass; var i = 0
      while (i < rows.length - 1 && cum + rows(i)._2 < p.rank) {
        cum += rows(i)._2; i += 1
      }
      Row.fromSeq(p.key ++ Seq(p.label, rows(i)._1))
    }
    val schema = StructType(
      groupCols.map(n => counts.schema(n)) ++
        Seq(StructField(labelCol, StringType, nullable = false),
          counts.schema(valCol).copy(name = outCol)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(out.asJava, schema)
  }

  /** [[selectRanksBounded]] with the single lower-median target; one row
    * per group: groupCols :+ outCol.
    */
  def lowerMedianBounded(counts: DataFrame, groupCols: Seq[String],
      valCol: String, nCol: String, outCol: String,
      bucketWidth: Double = 4096.0): DataFrame =
    selectRanksBounded(counts, groupCols, valCol, nCol,
      Seq(("m", tw => (tw + 1) / 2)), "_label", outCol, bucketWidth)
      .drop("_label")

  /** Median AND median-absolute-deviation per group from ONE job with NO
    * shuffle: the exact value histogram is a MERGEABLE SKETCH when the
    * value domain is bounded, so build it as one —
    *
    *   1. each input partition folds its rows into a per-group
    *      `LongMap[value → Σn]` (state ≤ min(partition rows, domain)) and
    *      emits it as value-sorted packed primitive arrays;
    *   2. `treeAggregate(depth = 2)` merges the packed histograms pairwise
    *      (linear merge of sorted runs) so no single node — driver
    *      included — ever fans in more than √partitions sketches at once,
    *      and every intermediate stays ≤ domain entries;
    *   3. the driver walks the final histogram twice: cumulative selection
    *      for the median, then re-key by |v − median| (the deviation
    *      histogram is a pure function of the value histogram) and select
    *      again for the MAD.
    *
    * Versus chaining two [[lowerMedianBounded]] calls this replaces five
    * actions + a full shuffle with a single scan-and-tree-reduce. Values
    * must be integral (LONG after cast); counts positive; selection is the
    * shared lower-median rule `2·cum ≥ total`. Group columns are carried
    * as STRINGS (cast on entry, emitted as StringType) — callers re-cast
    * if they need the original type. The loud `maxCollect` guard bounds
    * the merged sketch exactly like [[selectRanksBounded]]: distinct
    * values are domain-, not row-, proportional, so the artifact is the
    * same size at 100 TB as at sf0.001 — and for domains that are NOT
    * bounded, fail loudly and use [[selectRank]].
    * Emits one row per group: groupCols ++ (medOut, madOut).
    */
  def medianMadBounded(counts: DataFrame, groupCols: Seq[String],
      valCol: String, nCol: String, medOut: String, madOut: String,
      maxCollect: Int = 1 << 21): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = counts.sparkSession
    import spark.implicits._
    val nG = groupCols.length
    require(nG > 0, "medianMadBounded needs at least one group column")
    val SEP = ""
    val keyed = counts.filter(col(valCol).isNotNull)
      .select(concat_ws(SEP, groupCols.map(c => col(c).cast("string")): _*)
        .as("k"), col(valCol).cast("long").as("v"), col(nCol).cast("long").as("n"))
      .as[(String, Long, Long)]

    // packed histogram: values ascending at even slots, counts at odd
    type Hist = Map[String, Array[Long]]
    def mergeRuns(a: Array[Long], b: Array[Long]): Array[Long] = {
      val out = new scala.collection.mutable.ArrayBuilder.ofLong
      out.sizeHint(a.length + b.length)
      var i = 0; var j = 0
      while (i < a.length && j < b.length) {
        if (a(i) < b(j)) { out += a(i) += a(i + 1); i += 2 }
        else if (a(i) > b(j)) { out += b(j) += b(j + 1); j += 2 }
        else { out += a(i) += (a(i + 1) + b(j + 1)); i += 2; j += 2 }
      }
      while (i < a.length) { out += a(i) += a(i + 1); i += 2 }
      while (j < b.length) { out += b(j) += b(j + 1); j += 2 }
      out.result()
    }
    def mergeHists(x: Hist, y: Hist): Hist = {
      val m = (x.keySet ++ y.keySet).iterator.map { k =>
        (x.get(k), y.get(k)) match {
          case (Some(a), Some(b)) => k -> mergeRuns(a, b)
          case (Some(a), None) => k -> a
          case (None, Some(b)) => k -> b
          case _ => k -> Array.emptyLongArray
        }
      }.toMap
      require(m.valuesIterator.map(_.length / 2).sum <= maxCollect,
        s"merged histogram exceeds $maxCollect distinct (group, value) " +
          "entries: the value domain is not bounded enough for sketch-style " +
          "selection; use selectRank")
      m
    }
    val hist: Hist = keyed.rdd.mapPartitions { it =>
      val m = new scala.collection.mutable.HashMap[String,
        scala.collection.mutable.LongMap[Long]]
      it.foreach { case (k, v, n) =>
        val lm = m.getOrElseUpdate(k,
          new scala.collection.mutable.LongMap[Long]())
        lm(v) = lm.getOrElse(v, 0L) + n
      }
      val packed: Hist = m.iterator.map { case (k, lm) =>
        val sz = lm.size
        val vs = new Array[Long](sz)
        var i = 0
        lm.foreachKey { v => vs(i) = v; i += 1 }
        java.util.Arrays.sort(vs)
        val arr = new Array[Long](2 * sz)
        i = 0
        while (i < sz) { arr(2 * i) = vs(i); arr(2 * i + 1) = lm(vs(i)); i += 1 }
        k -> arr
      }.toMap
      Iterator.single(packed)
    }.treeAggregate(Map.empty: Hist)(mergeHists, mergeHists, depth = 2)

    // cumulative selection over a packed (value, count) run: min value
    // whose cumulative count reaches ceil(total/2)
    def lowerMedianPacked(a: Array[Long]): Long = {
      var tw = 0L; var i = 1
      while (i < a.length) { tw += a(i); i += 2 }
      val rank = (tw + 1) / 2
      var cum = 0L; i = 0
      while (i + 2 < a.length && cum + a(i + 1) < rank) { cum += a(i + 1); i += 2 }
      a(i)
    }
    val out: Seq[Row] = hist.toSeq.sortBy(_._1).map { case (k, arr) =>
      val med = lowerMedianPacked(arr)
      val dv = new scala.collection.mutable.LongMap[Long]()
      var i = 0
      while (i < arr.length) {
        val d = math.abs(arr(i) - med)
        dv(d) = dv.getOrElse(d, 0L) + arr(i + 1)
        i += 2
      }
      val sz = dv.size
      val ds = new Array[Long](sz)
      i = 0
      dv.foreachKey { d => ds(i) = d; i += 1 }
      java.util.Arrays.sort(ds)
      val darr = new Array[Long](2 * sz)
      i = 0
      while (i < sz) { darr(2 * i) = ds(i); darr(2 * i + 1) = dv(ds(i)); i += 1 }
      val mad = lowerMedianPacked(darr)
      val groups: Seq[Any] =
        if (nG == 1) Seq(k) else k.split(SEP, -1).toSeq.padTo(nG, "")
      Row.fromSeq(groups ++ Seq(med, mad))
    }
    val schema = StructType(
      groupCols.map(n => StructField(n, StringType, nullable = true)) ++ Seq(
        StructField(medOut, LongType, nullable = false),
        StructField(madOut, LongType, nullable = false)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(out.asJava, schema)
  }
}
