package graft

import graft.ingest.FeedIngest
import graft.model.Schemas
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the reference's ingest semantics (SURVEY.md §1.3–1.4):
  * lossy projection, NULL for missing fields, epoch-ms normalization with
  * optional second-truncation parity, gzip transparency, natural-key dedup. */
class IngestSpec extends AnyFunSuite with SparkSuite {

  private val appStart = Schemas.feed("appStart")
  private def feedPath(p: String) = s"src/test/resources/feeds/$p"

  test("explicit schema drops undeclared fields and nulls missing ones (ua2sql.py:226–235)") {
    val df = FeedIngest.readFeed(spark, appStart, feedPath("appStart/job1"))
    assert(df.columns.toSet === appStart.wire.fieldNames.toSet) // extra_field/debug dropped
    val u2 = df.filter(col("userid") === "u2").collect().head
    assert(u2.isNullAt(u2.fieldIndex("submit_time")))
    assert(u2.isNullAt(u2.fieldIndex("remote_ip")))
    assert(u2.getAs[String]("platform") === "android")
    assert(df.count() === 3)
  }

  test("readEvolved aligns drifted parquet epochs by name and pins the target schema") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("evolved").toString
    // epoch 1: original layout (no `score` yet); epoch 2 added `score`,
    // retired `legacy_flag`, and widened id to string at the source
    Seq((1L, "a", true), (2L, "b", false))
      .toDF("id", "name", "legacy_flag").write.parquet(s"$root/epoch1")
    Seq(("3", "c", 0.5), ("4", "d", 0.9))
      .toDF("id", "name", "score").write.parquet(s"$root/epoch2")
    val target = StructType(Seq(
      StructField("id", StringType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val got = FeedIngest.readEvolved(spark,
      Seq(s"$root/epoch1", s"$root/epoch2"), target)
    assert(got.schema === target, s"schema not pinned: ${got.schema}")
    val rows = got.collect().map(r =>
      (r.getString(0), r.getString(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1)
    assert(rows === Array(
      ("1", "a", None), ("2", "b", None),            // missing score → NULL, id cast
      ("3", "c", Some(0.5)), ("4", "d", Some(0.9)))) // legacy_flag dropped
  }

  test("epoch-ms keeps millisecond fidelity by default (ts=...207179 → .179)") {
    val df = FeedIngest.ingest(spark, appStart, feedPath("appStart/job1"))
    val u1 = df.filter(col("userid") === "u1")
      .select(unix_millis(col("ts")).as("ms")).collect().head.getLong(0)
    assert(u1 === 1704067207179L)
  }

  test("paritySeconds truncates to whole seconds like time.gmtime (ua2sql.py:232–233)") {
    val df = FeedIngest.ingest(spark, appStart, feedPath("appStart/job1"), paritySeconds = true)
    val ms = df.select(unix_millis(col("ts")).as("ms"), col("userid"))
      .collect().map(r => r.getAs[String]("userid") -> r.getLong(0)).toMap
    assert(ms("u1") === 1704067207000L) // .179 truncated
    assert(ms("u2") === 1704067300000L) // .500 truncated (not rounded)
  }

  test("gzip NDJSON reads identically to plain (replaces ua2sql.py:157–158)") {
    val plain = FeedIngest.ingest(spark, appStart, feedPath("appStart/job1"))
      .orderBy("userid").collect()
    val gz = FeedIngest.ingest(spark, appStart, feedPath("appStart_gz/job1"))
      .orderBy("userid").collect()
    assert(plain.toSeq === gz.toSeq)
  }

  test("natural-key dedup repairs the at-least-once replay window (ua2sql.py:274–278)") {
    // u3 appears in both job dirs; dedup keeps one row
    val replay = FeedIngest.readFeed(spark, appStart, feedPath("appStart/job1"))
      .union(FeedIngest.readFeed(spark, appStart, feedPath("appStart/job2")))
    val deduped = FeedIngest.dedup(FeedIngest.normalize(replay), appStart)
    assert(replay.count() === 5)
    assert(deduped.count() === 4)
    assert(deduped.filter(col("userid") === "u3").count() === 1)
  }

  test("JSONB payloads survive verbatim as JSON text (ua2sql.py:68,85)") {
    val custom = FeedIngest.ingest(spark, Schemas.feed("custom"), feedPath("custom/job1"))
    val params = custom.filter(col("userid") === "u1")
      .select(get_json_object(col("custom_params"), "$.level").as("lvl"),
        get_json_object(col("custom_params"), "$.nested.a").as("a"))
      .collect().head
    assert(params.getString(0) === "7")
    assert(params.getString(1) === "1")
    val u2 = custom.filter(col("userid") === "u2")
      .select(col("custom_params")).collect().head.getString(0)
    assert(u2.contains("dragon"))
  }

  test("transaction amount is exact decimal money (Numeric → DecimalType(18,4))") {
    val tx = FeedIngest.ingest(spark, Schemas.feed("transaction"), feedPath("transaction/job1"))
    val amounts = tx.select(sum(col("amount")).as("total")).collect().head.getDecimal(0)
    assert(amounts.compareTo(new java.math.BigDecimal("5.98")) === 0)
  }

  test("corrupt line: FAILFAST raises like the reference; PERMISSIVE recovers") {
    // reference parity: bare json.loads would raise (ua2sql.py:222)
    val strict = FeedIngest.readFeed(spark, appStart, feedPath("corrupt/job1"))
    val err = intercept[Exception](strict.collect())
    assert(err.getMessage.toLowerCase.contains("malformed") ||
      Option(err.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
    // robust mode: bad line → all-null row, good lines intact
    val lax = FeedIngest.readFeed(spark, appStart, feedPath("corrupt/job1"), failFast = false)
    assert(lax.filter(col("userid").isNotNull).count() === 2)
    assert(lax.count() === 3)
  }

  test("unionByName builds the all-events view across feed schemas (SURVEY.md §2.I)") {
    val custom = FeedIngest.ingest(spark, Schemas.feed("custom"), feedPath("custom/job1"))
    val tx = FeedIngest.ingest(spark, Schemas.feed("transaction"), feedPath("transaction/job1"))
    // the three feeds share the appStart column core; missing columns null-fill
    val all = custom.unionByName(tx, allowMissingColumns = true)
    assert(all.count() === 4)
    assert(all.columns.toSet === (custom.columns.toSet ++ tx.columns.toSet))
    // transaction rows have no `name`; custom rows have no `amount`
    assert(all.filter(col("name").isNull).count() === 2)
    assert(all.filter(col("amount").isNull).count() === 2)
  }

  test("property: second-truncation equals ms - ms % 1000 for arbitrary epochs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val gen = Gen.choose(0L, 4102444800000L) // 1970..2100
    val prop = Prop.forAll(gen) { rawMs =>
      val df = Seq(rawMs).toDF("ts")
      val out = FeedIngest.normalize(df, paritySeconds = true)
        .select(unix_millis(col("ts"))).collect().head.getLong(0)
      out == rawMs - rawMs % 1000
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(20))
    assert(res.passed, res.status.toString)
  }

  test("quarantine scan splits good rows from corrupt lines and keeps the raw text") {
    val dir = java.nio.file.Files.createTempDirectory("graft-quarantine")
    val lines = Seq(
      """{"userid": "u1", "platform": "ios", "ts": 1704067200000}""",
      """{"userid": "u2", "platform": "android"""", // truncated JSON
      """{"userid": "u3", "platform": "web", "ts": 1704067201000}""",
      """not json at all""")
    java.nio.file.Files.write(dir.resolve("part-0.json"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val scan = FeedIngest.readFeedQuarantine(spark, appStart, dir.toString)
    assert(scan.good.columns.toSet === appStart.wire.fieldNames.toSet)
    assert(scan.good.select("userid").collect().map(_.getString(0)).toSet === Set("u1", "u3"))
    val rawLines = scan.quarantined.collect().map(_.getString(0))
    assert(rawLines.length === 2)
    assert(rawLines.exists(_.contains("u2")) && rawLines.contains("not json at all"))
    scan.release() // cache must not outlive the batch
    // FAILFAST on the same input throws — the delta this API exists for.
    intercept[org.apache.spark.SparkException] {
      FeedIngest.readFeed(spark, appStart, dir.toString).collect()
    }
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
