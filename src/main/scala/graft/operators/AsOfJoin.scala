package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic backward as-of join: for every left row, attach the latest
  * right row with `right.ts <= left.ts` within the same key.
  *
  * Implemented as union + ordered window (last_value of right-side columns
  * over the merged stream) rather than a per-key sort-merge — one shuffle
  * on the key, no range-join explosion, skew handled by AQE. This is the
  * plan shape that survives 100 TB: the classic alternative
  * (left join right on key + ts-range, then window-dedup) shuffles
  * |left|×|matching right| rows; this shuffles |left|+|right|.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (its non-key/ts columns are appended,
    *                  null when no earlier right row exists)
    * @param keyCols   equality keys
    * @param tsCol     ordering column name (present on both sides)
    * @param rightCols right columns to carry (default: all but keys/ts)
    */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, rightCols: Seq[String] = Nil): DataFrame = {
    val carry = if (rightCols.nonEmpty) rightCols
      else right.columns.toSeq.filterNot(c => keyCols.contains(c) || c == tsCol)

    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_side", lit(1))
      .select(leftCols.map(col) ++ Seq(col("_side")) ++
        carry.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")): _*)
    val r = right
      .withColumn("_side", lit(0))
      .select(keyCols.map(col) ++ Seq(col(tsCol), col("_side")) ++
        carry.map(c => col(c).as(s"_r_$c")): _*)
    val merged = l.unionByName(r, allowMissingColumns = true)

    // right rows sort before left rows at equal ts (side 0 < 1), so a left
    // row at ts T sees right rows with ts <= T — backward as-of semantics.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = carry.foldLeft(merged) { (d, c) =>
      d.withColumn(s"_r_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }
    val out = filled.filter(col("_side") === 1).drop("_side")
    carry.foldLeft(out)((d, c) => d.withColumnRenamed(s"_r_$c", c))
  }
}
