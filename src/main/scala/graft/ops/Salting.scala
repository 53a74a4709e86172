package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Key-salting for skewed equi-joins — the manual fallback when AQE's
 * skew-join splitting isn't available (e.g. the skewed side feeds a
 * bucketed/pre-partitioned exchange AQE won't touch) or when one key is so
 * hot a single split still overwhelms a task.
 *
 * Shape: the skewed (large) side gets a uniform random salt in [0, n);
 * the other side is replicated n× with every salt value. The join key
 * becomes (key, salt), fanning each hot key's rows across n tasks. Row
 * multiplicity is preserved exactly — results equal the unsalted join.
 *
 * n trades replication of the small side against fan-out of the hot keys;
 * at 100 TB pick n ≈ (hot-key row count) / (target rows per task), and
 * salt only keys above a frequency threshold if the small side is big
 * (pass the hot-key set as `onlyKeys`).
 */
object Salting {

  val SaltCol = "__graft_salt"

  /**
   * Inner equi-join `skewed ⋈ other` on `key`, fanned out over `n` salts.
   * If `onlyKeys` is given, only those (hot) keys are salted/replicated;
   * all other keys join with salt 0 and no replication cost.
   */
  def saltedEquiJoin(skewed: DataFrame, other: DataFrame, key: String, n: Int,
                     onlyKeys: Option[Set[Any]] = None): DataFrame = {
    require(n > 0, "salt count must be positive")
    val isHot: Column = onlyKeys match {
      case Some(ks) => col(key).isin(ks.toSeq: _*)
      case None => lit(true)
    }
    val saltedLeft = skewed.withColumn(SaltCol,
      when(isHot, (rand(42) * n).cast("int")).otherwise(lit(0)))
    val salts = explode(sequence(lit(0), when(isHot, n - 1).otherwise(0)))
    val replicatedRight = other.withColumn(SaltCol, salts)
    saltedLeft.join(replicatedRight,
        saltedLeft(key) === replicatedRight(key) &&
          saltedLeft(SaltCol) === replicatedRight(SaltCol))
      .drop(replicatedRight(key))
      .drop(saltedLeft(SaltCol)).drop(replicatedRight(SaltCol))
  }
}
