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
}
