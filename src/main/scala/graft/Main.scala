package graft

import graft.ingest.{DbConfig, GraftConfig, Pipeline}
import graft.model.Schemas
import org.apache.spark.sql.SparkSession

/**
 * CLI entry point — the engine's face of the reference's
 * `python ua2sql.py config.json` contract (README.md:4–6,
 * ua2sql.py:281–297).
 *
 * Usage: graft.Main <config.json> [--job-id <id>]
 *
 * Reads the typed config (same required/optional keys as the reference),
 * then runs one ingest cycle for every feed whose staging directory
 * exists under `<stagingPath>/<feedName>`: normalize → dedup →
 * partitioned warehouse → ledger append. The request/poll/download legs
 * against the Unity export API (driver-side HTTP,
 * [[graft.sources.UnityExportClient]]) run upstream of this program in a
 * connected deployment; offline, staged files are the input contract.
 */
object Main {

  /**
   * Builds the DB sink for a DB-configured run (reference step 2: rows
   * into PostgreSQL, ua2sql.py:88–91, 209–246). Auto-detects the driver:
   * when a JDBC driver accepting the configured URL is on the classpath
   * (drivers self-register via ServiceLoader) the live JDBC sink with the
   * reference's 1000-row insert batching (ua2sql.py:238–246) is selected;
   * otherwise a loud dry-run sink, so an offline deployment (this
   * environment ships no PostgreSQL jar) degrades safely — rows still land
   * in the parquet warehouse — and the live path lights up the moment a
   * driver jar is added, with no config change. A `var` so tests can
   * substitute a recording sink and still drive the full CLI path.
   */
  private[graft] var jdbcSinkFactory: DbConfig => graft.sink.BatchSink = db =>
    if (graft.sink.JdbcSink.driverAvailable(db.jdbcUrl))
      new graft.sink.JdbcSink(db.jdbcUrl,
        Map("user" -> db.user, "password" -> db.password), batchSize = 1000)
    else new graft.sink.DryRunSink(db.jdbcUrl)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Main <config.json> [--job-id <id>]")
    val cfg = GraftConfig.load(args(0))
    // Default jobId is DETERMINISTIC over the staged input (names+sizes):
    // a crash-and-rerun on the same staged files reuses the same jobId, so
    // the per-job overwrite stays idempotent even without --job-id (a
    // timestamp default would mint a fresh directory per attempt and
    // reopen the duplicate window the layout exists to close).
    val jobId = args.sliding(2).collectFirst {
      case Array("--job-id", id) => id
    }.getOrElse("auto-" + stagingFingerprint(cfg.stagingPath))

    // spark-submit injects spark.master as a system property; standalone
    // runs (sbt runMain, tests) fall back to local. An already-running
    // session (embedding callers, tests) is reused — and then NOT stopped
    // on exit: this main only tears down what it created.
    val existing = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    val spark = existing.getOrElse {
      val master = sys.props.getOrElse("spark.master",
        sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      SparkSession.builder()
        .appName("graft-ingest")
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    }
    // Only our own session gets its log level forced; a reused embedder
    // session keeps the caller's logging configuration.
    if (existing.isEmpty) spark.sparkContext.setLogLevel("WARN")
    // ingest_date partitioning must be UTC regardless of who built the
    // session (to_date resolves in the session timezone); restore the
    // caller's setting on the way out.
    val prevTz = spark.conf.getOption("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try {

      val runs = Schemas.feeds.flatMap { feed =>
        val staging = s"${cfg.stagingPath}/${feed.name}"
        if (new java.io.File(staging).exists())
          Some(Pipeline.FeedRun(feed, staging, s"$jobId-${feed.name}"))
        else None
      }
      require(runs.nonEmpty, s"no feed staging dirs found under ${cfg.stagingPath}")

      val dbSink = cfg.db.map(jdbcSinkFactory)
      val counts = Pipeline.runAll(spark, runs, cfg.warehouseRoot, cfg.ledgerPath,
        dbSink = dbSink, backupRoot = cfg.backupPath)
      counts.toSeq.sortBy(_._1).foreach { case (feed, n) =>
        println(s"[graft] $feed: loaded $n rows")
      }
      val dbNote = cfg.db.map(d => s" db=${d.jdbcUrl}").getOrElse("")
      println(s"[graft] warehouse=${cfg.warehouseRoot} ledger=${cfg.ledgerPath} jobId=$jobId$dbNote")
    } finally {
      prevTz match {
        case Some(tz) => spark.conf.set("spark.sql.session.timeZone", tz)
        case None => spark.conf.unset("spark.sql.session.timeZone")
      }
      if (existing.isEmpty) spark.stop()
    }
  }

  /** md5 over the sorted relative-path + size listing of the per-feed
    * staging dirs — stable across reruns while the staged files are
    * unchanged. Only the known feed subdirectories are walked, never the
    * whole staging tree: under the reference config dialect the
    * warehouse/ledger default to `<stagingPath>/graft-{warehouse,ledger}`,
    * so a full-tree walk would fold the previous run's own outputs into
    * the fingerprint and every rerun would mint a fresh jobId — exactly
    * the duplicate-load window the deterministic jobId exists to close. */
  private[graft] def stagingFingerprint(stagingPath: String): String = {
    import scala.jdk.CollectionConverters._
    val rootPath = java.nio.file.Paths.get(stagingPath)
    val listing = Schemas.feeds.map(_.name).sorted.flatMap { feed =>
      val dir = rootPath.resolve(feed)
      if (!java.nio.file.Files.isDirectory(dir)) Seq.empty[String]
      else {
        val walk = java.nio.file.Files.walk(dir)
        try walk.iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(p => s"${rootPath.relativize(p)}:${java.nio.file.Files.size(p)}")
          .toList
        finally walk.close()
      }
    }.sorted.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(listing.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
  }
}
