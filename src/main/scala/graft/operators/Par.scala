package graft.operators

import org.apache.spark.sql.DataFrame

/** CPU-bound stage fan-out. Single-file parquet inputs with one row group
  * arrive as ONE partition, and Spark fuses per-row compute (signature
  * UDFs, decoders, pair scans) into that single-threaded scan stage. A
  * cheap round-robin repartition ahead of heavy per-row work spreads it
  * across the executor cores; on a real cluster the same call spreads a
  * skewed file layout. No-op when the frame is already parallel enough.
  */
object Par {
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** Data-derived width for an explicitly pinned (AQE-immune,
    * REPARTITION_BY_NUM) repartition at a CPU-dense stage:
    * ceil(rows / targetRowsPerTask), clamped to [1, 4 × cores].
    *
    * The count derives from the DATA, not the core count — a
    * `repartition(defaultParallelism, …)` pin is right at exactly one
    * scale: below it (sf0.1) it manufactures core-count kilobyte tasks
    * whose scheduling costs more than they parallelize (the r12 8c/32c
    * anti-scaling, ratios 0.41/0.5), above it (100 TB) it caps a
    * terabyte shuffle at machine width. rows/target is scale-invariant:
    * the same call yields a handful of real tasks at sf0.1 and saturates
    * the 4×cores cap only when the data justifies it. `rows` must come
    * from an already-paid action (a checkpointed count, a guard
    * aggregate), never a fresh scan.
    */
  def sizedPartitions(df: DataFrame, rows: Long,
      targetRowsPerTask: Long): Int = {
    val cap = df.sparkSession.sparkContext.defaultParallelism.toLong * 4
    val want = (rows + targetRowsPerTask - 1) / targetRowsPerTask
    math.max(1L, math.min(want, cap)).toInt
  }
}
