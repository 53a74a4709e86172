package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /**
   * Per-file (rows, min, max) stats manifest over `statCol` for a written
   * parquet layout — one CONTROL-PLANE row per data file. This is the
   * metadata a transactional table format (or parquet footers) persists at
   * write time; deriving it here costs one aggregate scan, paid once per
   * layout (callers memoize — the Bucketing write-once lesson). After a
   * [[sortedShards]] rewrite on `statCol`, file ranges are disjoint, so a
   * range predicate intersects O(1) of them — the file-skipping that makes
   * selective scans at 100 TB read gigabytes instead of the corpus.
   */
  def statsManifest(spark: SparkSession, layoutDir: String,
                    statCol: String): Array[(String, Long, Double, Double)] = {
    import spark.implicits._
    spark.read.parquet(layoutDir)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(statCol).cast("double")).as("mn"),
        max(col(statCol).cast("double")).as("mx"))
      .as[(String, Long, Double, Double)]
      .collect()
  }

  /**
   * Range scan over a layout that reads ONLY the files whose [min, max]
   * envelope intersects [lo, hi) per the manifest; the residual in-file
   * filter still applies (file stats are an envelope, not a membership
   * proof). Returns the pruned frame plus (filesRead, filesTotal) so
   * callers can assert the skip actually happened.
   */
  def prunedRangeScan(spark: SparkSession, statCol: String, lo: Double, hi: Double,
                      manifest: Array[(String, Long, Double, Double)]): (DataFrame, Int, Int) = {
    val keep = manifest.collect { case (f, _, mn, mx) if mx >= lo && mn < hi => f }
    val df =
      if (keep.isEmpty)
        spark.read.parquet(manifest.map(_._1).toIndexedSeq: _*).limit(0)
      else spark.read.parquet(keep.toIndexedSeq: _*)
    (df.filter(col(statCol) >= lo && col(statCol) < hi), keep.length, manifest.length)
  }

  /**
   * Small-file compaction — the maintenance op every incremental ingest
   * eventually needs: micro-batch and per-job writes (FeedIngest's
   * jobId dirs, streaming sinks) accumulate files far below the
   * 128 MB-class size parquet scans want, and at warehouse scale the
   * driver's file-listing and per-file task overhead come to dominate
   * reads long before data volume does. Rewrites a parquet directory to
   * ⌈rows / targetRowsPerFile⌉ files — `coalesce` when merging down
   * (narrow, no shuffle: it only fuses read-splits) and `repartition`
   * when splitting up (coalesce cannot increase partitions; the split
   * direction right-sizes oversized files at the cost of one
   * round-robin shuffle) — and swaps the result in with
   * two atomic directory renames. Each rename is individually atomic, so
   * a reader never observes a half-written directory; there IS a brief
   * window between the two renames where the root is absent, and a crash
   * there strands the data in `.compact-bak` — which the next invocation
   * detects and restores (stale scratch dirs from any crashed attempt are
   * likewise recovered or discarded up front, so a failed run never wedges
   * the directory). A real warehouse closes the no-root window with a
   * transactional table-format commit; the two-rename dance plus recovery
   * is its filesystem-level approximation. LEAF directories only: a
   * Hive-partitioned root is rejected (an unpartitioned rewrite would
   * flatten it) — compact each leaf partition instead. Returns
   * (filesBefore, filesAfter). Row content is unchanged — compaction is
   * layout-only, LayoutSpec pins both.
   */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
              targetRowsPerFile: Long): (Int, Int) = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    require(targetRowsPerFile > 0)
    def parquetFiles(p: java.nio.file.Path): Int = {
      val s = Files.list(p)
      try s.filter(f => f.toString.endsWith(".parquet")).count().toInt
      finally s.close()
    }
    val root = Paths.get(dir)
    val tmp = root.resolveSibling(root.getFileName.toString + ".compact-tmp")
    val bak = root.resolveSibling(root.getFileName.toString + ".compact-bak")
    // Crash recovery from a previous attempt: a stale tmp is an unfinished
    // WRITE (safe to discard); a stale bak with the root present is an
    // unfinished CLEANUP (safe to discard); a bak WITHOUT a root means the
    // previous run died between the two renames — restore it first.
    if (Files.exists(bak) && !Files.exists(root))
      Files.move(bak, root, StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(tmp)) org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    if (Files.exists(bak)) org.apache.commons.io.FileUtils.deleteDirectory(bak.toFile)
    // Leaf directories only: a Hive-partitioned root (partition subdirs)
    // would be silently flattened by an unpartitioned rewrite, destroying
    // the partition-pruning layout — compact each leaf instead.
    val sub = Files.list(root)
    val hasSubdirs = try sub.anyMatch(p => Files.isDirectory(p)) finally sub.close()
    require(!hasSubdirs,
      s"$dir contains subdirectories (partitioned layout?) — compact each leaf partition directory")
    val before = parquetFiles(root)
    val df = spark.read.parquet(dir)
    val n = df.count()
    val files = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    val scanParts = df.rdd.getNumPartitions
    val sized =
      if (files < scanParts) df.coalesce(files)
      else if (files > scanParts) df.repartition(files)
      else df
    try sized.write.mode("overwrite").parquet(tmp.toString)
    catch { case e: Throwable =>
      // don't leak a half-written scratch dir
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile); throw e
    }
    Files.move(root, bak, StandardCopyOption.ATOMIC_MOVE)
    try Files.move(tmp, root, StandardCopyOption.ATOMIC_MOVE)
    catch { case e: Throwable =>
      // restore the original layout rather than leaving no directory
      Files.move(bak, root, StandardCopyOption.ATOMIC_MOVE)
      throw e
    }
    org.apache.commons.io.FileUtils.deleteDirectory(bak.toFile)
    (before, parquetFiles(root))
  }

  /**
   * Idempotent partition rewrite — the daily-rerun story for a
   * date-partitioned lake layout (ingest/FeedIngest's D4 directories):
   * `partitionOverwriteMode=dynamic` replaces ONLY the partitions present
   * in the incoming frame and leaves every other partition untouched, so
   * re-running a day after a partial failure converges to the same state
   * instead of truncating the table (static overwrite) or duplicating
   * rows (append). The reference replays a day by job-ledger continuation
   * (ua2sql.py:165–176); this is the lake-side equivalent when the sink
   * is parquet rather than PostgreSQL. Scoped via the per-WRITER option,
   * not the session conf: a session-conf flip would race with any
   * concurrent overwrite on the shared SparkSession (their static
   * overwrite silently turning dynamic, or this one turning static on
   * the conf restore).
   */
  def overwritePartitions(df: DataFrame, root: String, partitionCol: String): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol).parquet(root)
}
