package graft

import graft.ingest.Ledger
import org.scalatest.funsuite.AnyFunSuite

/** Pins the job-ledger semantics: latest-per-key lookup (ua2sql.py:165–176)
  * and append (ua2sql.py:278). */
class LedgerSpec extends AnyFunSuite with SparkSuite {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def ledger = {
    import spark.implicits._
    Seq(
      (ts("2024-01-01 00:00:00"), "jobA1", "appStart"),
      (ts("2024-01-02 00:00:00"), "jobA2", "appStart"),
      (ts("2024-01-01 12:00:00"), "jobC1", "custom")
    ).toDF("ts", "jobId", "jobType")
  }

  test("latestJobId returns the newest job for one feed, None for unknown") {
    assert(Ledger.latestJobId(ledger, "appStart") === Some("jobA2"))
    assert(Ledger.latestJobId(ledger, "custom") === Some("jobC1"))
    assert(Ledger.latestJobId(ledger, "transaction") === None)
  }

  test("latestPerType returns one newest row per feed in a single pass") {
    val got = Ledger.latestPerType(ledger).collect()
      .map(r => r.getAs[String]("jobType") -> r.getAs[String]("jobId")).toMap
    assert(got === Map("appStart" -> "jobA2", "custom" -> "jobC1"))
  }

  test("append + read roundtrip preserves the ledger schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ledger").toString + "/ledger"
    ledger.write.parquet(dir)
    Ledger.append(spark, dir, "jobT9", "transaction")
    val re = Ledger.read(spark, dir)
    assert(re.count() === 4)
    assert(Ledger.latestJobId(re, "transaction") === Some("jobT9"))
  }
}
