package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) data layout — the write-side clustering pass that
 * makes MULTI-dimensional predicates prunable from parquet footer
 * min/max stats. A single-column sort gives perfect skipping on that
 * column and none on any other; interleaving the bits of two dimensions
 * makes each written file cover a small rectangle in (a, b) space, so a
 * selective filter on EITHER dimension (or both) skips most files.
 *
 * At warehouse scale this is a one-off `repartitionByRange(z) +
 * sortWithinPartitions(z)` at write time — one range exchange over data
 * that was being rewritten anyway — traded for footer-level pruning on
 * every subsequent scan. The z-value itself is a pure integer expression
 * (shifts and masks, whole-stage codegen), no UDF.
 */
object Layout {

  /** Morton z-value: interleaves the low `bits` bits of two NON-NEGATIVE
    * long columns (`a` on even bit positions, `b` on odd). 2·bits ≤ 63,
    * so bits ≤ 31. Values beyond `bits` bits fold into the same top
    * bucket — callers size `bits` to cover their domain. */
  def zValue(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      val abit = shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i)
      val bbit = shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
      acc.bitwiseOR(abit).bitwiseOR(bbit)
    }
  }

  /** The SQL twin of [[zValue]] (same shift/mask tree), for oracles and
    * the SQL face. */
  def zValueSql(a: String, b: String, bits: Int = 21): String =
    (0 until bits).map(i =>
      s"((($a >> $i) & 1) << ${2 * i}) | ((($b >> $i) & 1) << ${2 * i + 1})")
      .mkString("(", " | ", ")")

  /** Rewrites `df` into `partitions` files clustered by the z-curve over
    * (`a`, `b`): range-partition on z, sort within partitions, drop the
    * helper column (the projection preserves the sort, so the written
    * row groups keep tight min/max bounds on BOTH dimensions). */
  def layoutBy(df: DataFrame, a: String, b: String, bits: Int,
               partitions: Int): DataFrame =
    df.withColumn("_z", zValue(col(a), col(b), bits))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
}
