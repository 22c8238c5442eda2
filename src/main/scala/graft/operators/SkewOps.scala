package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling building blocks.
  *
  * Hub nodes in road networks (and hot keys in any 100 TB table) overload
  * single reducers. Two standing remedies, both deterministic:
  *
  *  - `saltedAgg`: two-phase aggregation — partial aggregate on
  *    (key, salt), final aggregate on key. Works for any algebraic
  *    aggregate (sum/count/min/max); Spark's own partial aggregation
  *    already does this for hash aggregates, but the explicit form also
  *    de-skews the *shuffle* when a single key would exceed one reducer
  *    (partials land on `salts` reducers before the tiny final pass).
  *  - `saltedJoin`: replicate the small side `salts`× and salt the big
  *    side's key, so one hot key spreads over `salts` reducers.
  */
object SkewOps {

  /** Deterministic per-row salt in [0, salts): hash of a secondary column
    * (or of the whole row via all columns) — no RNG, stable across retries
    * (a nondeterministic salt breaks task re-execution).
    */
  def salt(salts: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(salts))

  /** Two-phase salted sum/count per key. `valueCol` null → count-only. */
  def saltedAgg(df: DataFrame, keyCol: String, valueCol: Option[String],
      salts: Int, saltSource: Column): DataFrame = {
    val partial = df
      .withColumn("_salt", salt(salts, saltSource))
      .groupBy(col(keyCol), col("_salt"))
      .agg(
        count(lit(1)).as("_n"),
        valueCol.map(v => sum(col(v))).getOrElse(lit(0.0)).as("_s"))
    partial.groupBy(keyCol)
      .agg(sum("_n").as("n"), sum("_s").as("total"))
  }

  /** Broadcast-replicated salted join: big side salted, small side
    * exploded across all salt values. Equi-join on (key, salt).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCol: String,
      salts: Int, bigSaltSource: Column): DataFrame = {
    val b = big.withColumn("_salt", salt(salts, bigSaltSource))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(broadcast(s), Seq(keyCol, "_salt")).drop("_salt")
  }
}
