package graft

import graft.ingest.{GraftConfig, Ledger, Pipeline}
import graft.model.Schemas
import graft.sink.{ParquetSink, PgDdl}
import graft.sources.UnityExportClient
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end batch orchestration (E1–E4) + sink DDL + client payloads. */
class PipelineSpec extends AnyFunSuite with SparkSuite {

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  test("runFeed stages → warehouse → ledger; continuation resumes from it") {
    val wh = tmp("graft-wh")
    val ledger = tmp("graft-led") + "/ledger"
    val feed = Schemas.feed("appStart")
    assert(Pipeline.continuation(spark, ledger, feed) === None) // initial 30-day window

    val n1 = Pipeline.runFeed(spark,
      Pipeline.FeedRun(feed, "src/test/resources/feeds/appStart/job1", "job-001"),
      wh, ledger)
    assert(n1 === 3)
    assert(Pipeline.continuation(spark, ledger, feed) === Some("job-001"))

    val n2 = Pipeline.runFeed(spark,
      Pipeline.FeedRun(feed, "src/test/resources/feeds/appStart/job2", "job-002"),
      wh, ledger)
    assert(n2 === 2)
    assert(Pipeline.continuation(spark, ledger, feed) === Some("job-002"))

    val warehouse = spark.read.parquet(wh)
    assert(warehouse.count() === 5)
    assert(warehouse.columns.contains("ingest_date"))
    // partition pruning works on the Hive layout
    val pruned = warehouse.filter(org.apache.spark.sql.functions.col("jobType") === "appStart")
    assert(pruned.count() === 5)
  }

  test("runAll loads all three reference feeds concurrently") {
    val wh = tmp("graft-wh3")
    val ledger = tmp("graft-led3") + "/ledger"
    val runs = Seq(
      Pipeline.FeedRun(Schemas.feed("appStart"), "src/test/resources/feeds/appStart/job1", "a1"),
      Pipeline.FeedRun(Schemas.feed("custom"), "src/test/resources/feeds/custom/job1", "c1"),
      Pipeline.FeedRun(Schemas.feed("transaction"), "src/test/resources/feeds/transaction/job1", "t1"))
    val counts = Pipeline.runAll(spark, runs, wh, ledger)
    assert(counts === Map("appStart" -> 3, "custom" -> 2, "transaction" -> 2))
    val led = Ledger.latestPerType(Ledger.read(spark, ledger)).count()
    assert(led === 3)
  }

  test("staging cleanup removes loaded files non-recursively (ua2sql.py:180-184)") {
    val staging = tmp("graft-clean")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("src/test/resources/feeds/appStart/job1/part-0.json"),
      java.nio.file.Paths.get(s"$staging/part-0.json"))
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$staging/subdir"))
    val wh = tmp("graft-clean-wh")
    val n = Pipeline.runFeed(spark,
      Pipeline.FeedRun(Schemas.feed("appStart"), staging, "jc1"),
      wh, tmp("graft-clean-led") + "/ledger", cleanStaging = true)
    assert(n === 3)
    val left = new java.io.File(staging).listFiles.toSeq
    assert(left.map(_.getName) === Seq("subdir")) // files gone, dirs kept
  }

  test("parquet sink appends per table") {
    val root = tmp("graft-sink")
    val sink = new ParquetSink(root)
    import spark.implicits._
    sink.write(Seq((1L, "a")).toDF("id", "v"), "t1")
    sink.write(Seq((2L, "b")).toDF("id", "v"), "t1")
    assert(spark.read.parquet(s"$root/t1").count() === 2)
  }

  test("PG DDL mirrors the reference schema incl. INET/JSONB/NUMERIC") {
    val custom = PgDdl.createTableSql(Schemas.feed("custom"))
    assert(custom.contains("CREATE TABLE IF NOT EXISTS \"custom\""))
    assert(custom.contains("\"remote_ip\" INET"))
    assert(custom.contains("\"custom_params\" JSONB"))
    assert(custom.contains("\"ts\" TIMESTAMP"))
    assert(custom.contains("\"sessionid\" BIGINT"))
    val tx = PgDdl.createTableSql(Schemas.feed("transaction"))
    assert(tx.contains("\"amount\" NUMERIC(18,4)"))
    assert(tx.contains("\"receipt\" JSONB"))
    assert(PgDdl.jobLedgerSql.contains("\"JobId\""))
  }

  test("export request payload: continueFrom replaces startDate (ua2sql.py:101-104)") {
    import java.time.LocalDate
    val end = LocalDate.of(2024, 2, 1)
    val initial = UnityExportClient.requestBody(end, "appStart", None, None)
    assert(initial.contains("\"startDate\": \"2024-01-02\"")) // end - 30d backfill
    assert(!initial.contains("continueFrom"))
    val continued = UnityExportClient.requestBody(end, "appStart", None, Some("job-9"))
    assert(continued.contains("\"continueFrom\": \"job-9\""))
    assert(!continued.contains("startDate"))
    assert(continued.contains("\"dataset\": \"appStart\""))
    assert(continued.contains("\"format\": \"json\""))
  }

  test("config parse: required keys, optional backup, ~ expansion (ua2sql.py:15-35)") {
    val cfg = GraftConfig.fromJson(
      """{"projectId": "p1", "apiKey": "k1", "warehouseRoot": "~/wh",
        |"stagingPath": "/tmp/stage", "ledgerPath": "/tmp/ledger"}""".stripMargin)
    assert(cfg.projectId === "p1")
    assert(cfg.warehouseRoot === System.getProperty("user.home") + "/wh")
    assert(cfg.backupPath === None)
    val err = intercept[IllegalArgumentException] {
      GraftConfig.fromJson("""{"projectId": "p1"}""")
    }
    assert(err.getMessage.contains("apiKey"))
  }
}
