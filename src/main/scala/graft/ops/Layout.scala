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
    * so bits ≤ 31.
    *
    * Values ≥ 2^bits SATURATE to the all-ones cell on their axis rather
    * than wrapping: a plain low-bits take would alias value v with
    * v + 2^bits — scattering far-apart keys into the same file and
    * silently destroying the locality this exists to provide (the q75
    * oracle would compute the same wrap and never catch it). Saturation
    * is order-preserving: in-range values keep full locality; the
    * out-of-range tail degrades only at the cap. Size `bits` to cover
    * the domain. */
  def zValue(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val cap = (1L << bits) - 1
    val ac = least(a, lit(cap))
    val bc = least(b, lit(cap))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      val abit = shiftleft(shiftrightunsigned(ac, i).bitwiseAND(lit(1L)), 2 * i)
      val bbit = shiftleft(shiftrightunsigned(bc, i).bitwiseAND(lit(1L)), 2 * i + 1)
      acc.bitwiseOR(abit).bitwiseOR(bbit)
    }
  }

  /** The SQL twin of [[zValue]] (same saturate + shift/mask tree), for
    * oracles and the SQL face. */
  def zValueSql(a: String, b: String, bits: Int = 21): String = {
    val cap = (1L << bits) - 1
    val (ac, bc) = (s"LEAST($a, $cap)", s"LEAST($b, $cap)")
    (0 until bits).map(i =>
      s"((($ac >> $i) & 1) << ${2 * i}) | ((($bc >> $i) & 1) << ${2 * i + 1})")
      .mkString("(", " | ", ")")
  }

  /** Rewrites `df` into `partitions` files clustered by the z-curve over
    * (`a`, `b`): range-partition on z, sort within partitions, drop the
    * helper column (the projection preserves the sort, so the written
    * row groups keep tight min/max bounds on BOTH dimensions). */
  def layoutBy(df: DataFrame, a: String, b: String, bits: Int,
               partitions: Int): DataFrame = {
    val zCol = "_graft_zorder"
    require(!df.columns.contains(zCol),
      s"input already has a $zCol column — rename it before layoutBy")
    df.withColumn(zCol, zValue(col(a), col(b), bits))
      .repartitionByRange(partitions, col(zCol))
      .sortWithinPartitions(zCol)
      .drop(zCol)
  }

  /**
   * Globally-sorted shard export — the training-data write path: `shards`
   * output files whose KEY RANGES DO NOT OVERLAP, each internally sorted.
   * A consumer can then stream shard 0, shard 1, … and see one totally
   * ordered corpus without any merge step, and a range predicate prunes
   * whole shards from parquet footer min/max alone (the 1-D counterpart
   * of the z-order layout above).
   *
   * This is deliberately NOT `orderBy.write`: a global sort plans the
   * same rangepartitioning exchange, but spelling it repartitionByRange +
   * sortWithinPartitions states the contract (per-shard order + disjoint
   * ranges) without ever implying a single-partition collect. One range
   * exchange total — the sampled range boundaries spread the sort over
   * all executors; skewed key distributions get proportionally sized
   * ranges from the sampler for free. Determinism note: range boundaries
   * come from reservoir SAMPLING, so shard MEMBERSHIP at the boundaries
   * can vary run to run while the sort order itself never does — exact
   * reproducible shard membership needs the GlobalRank path (q45's
   * two-pass rank ÷ shards), at the cost of a second exchange.
   */
  def sortedShards(df: DataFrame, sortCols: Seq[String], shards: Int): DataFrame = {
    require(sortCols.nonEmpty && shards >= 1)
    df.repartitionByRange(shards, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
  }
}
