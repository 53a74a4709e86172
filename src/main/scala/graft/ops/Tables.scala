package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, TimestampNTZType, TimestampType}

/**
 * Shared helpers for the query surface.
 *
 * Oracle-parity conventions (every query here is differential-tested
 * against DuckDB running equivalent SQL on the same parquet — SURVEY.md §5):
 *
 *  - **Exact sums.** Floating-point SUM is order-dependent, and Spark's
 *    partial aggregation order is nondeterministic — so money-ish doubles
 *    are cast to DECIMAL(18,4) *before* aggregation. Decimal addition is
 *    exact and associative, so Spark and DuckDB agree bit-for-bit no
 *    matter how partitions combine. This is also the 100 TB answer:
 *    results don't drift as parallelism grows.
 *  - **Averages** are expressed as decimal-sum ÷ count in double, rounded —
 *    both engines then evaluate the identical expression on identical
 *    inputs.
 *  - **Determinism.** Every query ends in a total ORDER BY over a unique
 *    key set; every LIMIT sits above such an ORDER BY.
 *  - **Type alignment.** Counts stay BIGINT on both sides; DuckDB's
 *    HUGEINT-producing integer SUMs are cast back to BIGINT in oracle SQL;
 *    timestamps are compared as epoch-millis BIGINTs (the fixtures'
 *    ns-precision parquet reads as µs in Spark but ns in DuckDB).
 */
object Tables {

  /**
   * Fixture timestamps are naive (no isAdjustedToUTC flag), which Spark ≥3.4
   * reads as TIMESTAMP_NTZ — a type unix_micros/unix_millis reject. The
   * whole query surface (and the DuckDB oracle, which treats the same bytes
   * as plain TIMESTAMP) assumes UTC wall-clock instants, so normalize every
   * NTZ column to TimestampType here: under the UTC session zone the cast is
   * instant-preserving and byte-identical to the pre-3.4 read path.
   */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    tableCache.computeIfAbsent(
      AppCaches.key(spark, dir, tableCache) + "#" + name,
      { _ => ntzNorm(spark.read.parquet(s"$dir/$name.parquet")) })

  /** Plan-level read memo: `spark.read.parquet` pays a driver-side file
    * listing + footer schema read PER CALL, and a 280-query bench
    * resolves the same ~10 fixture tables thousands of times. Memoizing
    * the ANALYZED FRAME (relation + schema — never row data; every use
    * still scans parquet) is what a catalog table gives you for free,
    * and at 100 TB the avoided re-listing of a large table's files is
    * the guide §6 "file listing" cost. Evicted with the application via
    * [[AppCaches]] like every other control-plane memo. */
  private val tableCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** The NTZ→UTC-instant cast chain applied to an already-read frame —
    * split out so STREAMING readers (which need an explicit schema and
    * so can't go through [[t]]) normalize identically. */
  def ntzNorm(raw: DataFrame): DataFrame =
    raw.schema.fields.filter(_.dataType == TimestampNTZType).foldLeft(raw) {
      (df, f) => df.withColumn(f.name, col(f.name).cast(TimestampType))
    }

  /**
   * The events fixture's timestamp precision has varied across driver
   * regenerations (ns in earlier rounds — readable only as a raw long under
   * spark.sql.legacy.parquet.nanosAsLong=true — µs naive today). Normalize
   * once here so every query sees the same three columns regardless:
   *   ts_ns — exact nanos (total ordering identical to DuckDB's ts order),
   *   ms    — epoch millis (what oracle SQL sees via epoch_ms(ts)),
   *   ts    — TimestampType for calendar functions.
   */
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsNorm(t(spark, dir, "events"))

  /** The ts_ns/ms/ts column normalization on an already-[[ntzNorm]]'d
    * events frame — shared by [[events]] and the streaming readers. */
  def eventsNorm(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ms", expr("ts_ns div 1000000"))
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000)
          .withColumn("ms", unix_millis(col("ts")))
    }

  /** Re-establish the session's configured parallelism before a CPU-bound
    * projection (crypto-hash fan-outs, string-DP verifies). Partitioning
    * is byte-based everywhere — a single-file scan yields one task, and
    * AQE coalesces a few-KB candidate exchange to one partition — which
    * starves stages whose cost is per-row COMPUTE, not bytes (AQE cannot
    * see expression cost). `spark.sql.shuffle.partitions` is the
    * deployment's statement of intended parallelism, so the inserted
    * round-robin exchange follows the scale knob; callers place it where
    * the rows are still narrow relative to the work done per row. */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)

  /** [[spread]] for SCAN-fused fan-outs, conditional on the upstream plan
    * actually being under-parallel (a single-file fixture scan): a no-op
    * when the scan already splits to >= the configured parallelism (any
    * real-scale table), so no corpus-wide exchange is added at scale. */
  def spreadIfNarrow(df: DataFrame): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= n) df else df.repartition(n)
  }

  /** Exact money arithmetic: decimal-cast before summing (see above). */
  val money: DecimalType = DecimalType(18, 4)

  /**
   * Present an exact decimal aggregate as a DOUBLE output column via an
   * engine-independent path: (decimal × 10^scale) is an exact integer,
   * BIGINT→DOUBLE is exact below 2^53, and 10^scale is an exact double, so
   * the final division is correctly rounded — bit-identical in Spark and
   * DuckDB. Two reasons decimal must not reach the output schema:
   *  1. result-consumer representations of DECIMAL columns differ across
   *     loaders (round 1: every decimal-typed output column hash-mismatched
   *     the driver compare while the values were provably equal);
   *  2. a direct decimal→double CAST is NOT correctly rounded in DuckDB
   *     (≈1 ulp drift vs Java BigDecimal.doubleValue).
   * Bounds, precisely: |sum| < 2^53 / 10^scale (≈ 9·10^11 at scale 4)
   * keeps BIGINT and double both exact; from there to Long.MaxValue /
   * 10^scale (≈ 9.2·10^14 at scale 4) the double output rounds; beyond
   * THAT the long conversion overflows — Spark (non-ANSI) yields NULL and
   * DuckDB raises — so a deployment summing past ~10^14 money units per
   * group must widen the shift to a decimal-to-decimal rescale instead.
   * The internal decimal aggregate itself has 10^24 headroom.
   */
  private def shifted(dec: Column, scale: Int): Column = {
    val p = math.pow(10, scale).toLong
    (dec * p).cast(LongType) / lit(p.toDouble)
  }

  def dsum(c: Column): Column = shifted(sum(c.cast(money)), 4)

  /**
   * Scale-6 variant for 3-factor money products (e.g. price·(1−disc)·(1+tax)):
   * those carry up to 6 true decimal digits, so a scale-4 cast can land on an
   * exact .00005 tie where Spark (HALF_UP) and DuckDB disagree; scale 6 is
   * exact and tie-free.
   */
  def dsum6(c: Column): Column = shifted(sum(c.cast(DecimalType(18, 6))), 6)
  def sqlDsum6(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,6))) * 1000000 AS BIGINT) / 1000000.0"

  /** Wrap an already-built decimal aggregate (e.g. a window SUM) for output. */
  def moneyOut(dec: Column): Column = shifted(dec, 4)
  def sqlMoneyOut(expr: String): String =
    s"CAST(($expr) * 10000 AS BIGINT) / 10000.0"

  /** Order-insensitive average: exact decimal sum ÷ count, in double.
    * No ROUND on either side: both engines evaluate the identical division
    * of bit-identical doubles. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** DuckDB SQL fragments mirroring dsum/davg. */
  def sqlDsum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,4))) * 10000 AS BIGINT) / 10000.0"
  def sqlDavg(expr: String): String =
    s"(${sqlDsum(expr)}) / COUNT(*)"
}
