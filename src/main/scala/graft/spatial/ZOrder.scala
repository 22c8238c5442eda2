package graft.spatial

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve encoding for spatial layout.
  *
  * The reference keeps locality with an R-tree (feature_table.py:265-414);
  * at 100 TB the columnar equivalent is a space-filling-curve sort: encode
  * each row's (x, y) grid cell as one interleaved integer, then
  * `repartitionByRange($"zcell")` (or sort-within-partitions) before the
  * parquet write. Rows that are close in 2-D space land in the same files,
  * so a 2-D bbox predicate prunes most row groups via parquet min/max stats
  * on the single zcell column — the same pruning the `_cell` partition
  * column gives, but hierarchical (one layout serves every query radius).
  *
  * Built entirely from codegen'd integer built-ins (shift/and/or) — no UDF
  * in the scan path — and mirrored bit-for-bit in DuckDB SQL by [[sqlExpr]]
  * for the oracle.
  */
object ZOrder {

  /** Interleave the low `bits` bits of integer columns x (even positions)
    * and y (odd positions) into a Morton code. Inputs must already be
    * quantized to [0, 2^bits).
    */
  def interleave(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms: Seq[Column] = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftrightunsigned(x.cast("long"), i) bitwiseAND lit(1L), 2 * i),
        shiftleft(shiftrightunsigned(y.cast("long"), i) bitwiseAND lit(1L), 2 * i + 1))
    }
    terms.reduce(_ bitwiseOR _)
  }

  /** DuckDB SQL replica of [[interleave]] over integer expressions. */
  def sqlExpr(x: String, y: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31)
    (0 until bits).flatMap { i =>
      Seq(s"(((($x) >> $i) & 1) << ${2 * i})",
        s"(((($y) >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " | ", ")")
  }
}
