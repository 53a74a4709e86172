package graft.model

import org.apache.spark.sql.types._

/**
 * Schemas for the reference's four tables and their wire (NDJSON) shapes.
 *
 * The reference declares these with SQLAlchemy DDL (ua2sql.py:37–86); the
 * type mapping follows SURVEY.md §1.2:
 *   DateTime → TimestampType, String → StringType, BigInteger → LongType,
 *   INET → StringType, Numeric → DecimalType(18,4), JSONB → StringType
 *   (raw JSON text, shredded on demand with from_json/get_json_object).
 *
 * Each feed has two shapes:
 *  - `wire`: what arrives on the Unity NDJSON export — `ts`/`submit_time`
 *    are epoch **milliseconds** (ua2sql.py:232–233), JSON payloads are
 *    nested objects we capture as raw strings.
 *  - `table`: the analytics-ready schema after ingest normalization
 *    (timestamps converted to UTC TimestampType).
 *
 * Surrogate `id` primary keys (ua2sql.py:40,47,58,72) are intentionally
 * absent: parquet needs no synthetic key, and for a JDBC sink the target
 * database generates them.
 */
object Schemas {

  /** Shared event-core columns (ua2sql.py:46–55). */
  private val appStartWireFields: Seq[StructField] = Seq(
    StructField("ts", LongType),           // epoch ms
    StructField("submit_time", LongType),  // epoch ms
    StructField("userid", StringType),
    StructField("remote_ip", StringType),  // INET → string
    StructField("platform", StringType),
    StructField("user_agent", StringType),
    StructField("sdk_ver", StringType)
  )

  /** appStart feed (ua2sql.py:46–55). */
  val appStartWire: StructType = StructType(appStartWireFields)

  /** custom feed (ua2sql.py:57–69): appStart + session/name/JSON payload. */
  val customWire: StructType = StructType(
    appStartWireFields ++ Seq(
      StructField("sessionid", LongType),        // BigInteger
      StructField("name", StringType),
      StructField("custom_params", StringType)   // JSONB → raw JSON text
    ))

  /** transaction feed (ua2sql.py:71–86): appStart + session + revenue. */
  val transactionWire: StructType = StructType(
    appStartWireFields ++ Seq(
      StructField("sessionid", LongType),
      StructField("currency", StringType),
      StructField("amount", DecimalType(18, 4)), // Numeric → exact money
      StructField("transactionid", StringType),
      StructField("productid", StringType),
      StructField("receipt", StringType)         // JSONB → raw JSON text
    ))

  /** Ingestion ledger (ua2sql.py:39–44): one row per completed export job. */
  val jobLedger: StructType = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("jobId", StringType),
    StructField("jobType", StringType)
  ))

  /** Post-ingest table schema: wire schema with epoch-ms columns as UTC timestamps. */
  def tableSchema(wire: StructType): StructType =
    StructType(wire.fields.map { f =>
      if (FeedSpec.epochMillisColumns.contains(f.name)) f.copy(dataType = TimestampType) else f
    })

  val feeds: Seq[FeedSpec] = Seq(
    FeedSpec("appStart", appStartWire, naturalKey = Seq("userid", "ts", "submit_time")),
    FeedSpec("custom", customWire, naturalKey = Seq("userid", "sessionid", "name", "ts")),
    FeedSpec("transaction", transactionWire, naturalKey = Seq("transactionid"))
  )

  def feed(name: String): FeedSpec =
    feeds.find(_.name == name).getOrElse(sys.error(s"unknown feed $name"))
}

/**
 * One Unity export feed (jobType). `naturalKey` drives exactly-once
 * deduplication — the upgrade over the reference's at-least-once gap
 * (ledger written only after all inserts, ua2sql.py:274–278).
 */
final case class FeedSpec(name: String, wire: StructType, naturalKey: Seq[String]) {
  def table: StructType = Schemas.tableSchema(wire)
}

object FeedSpec {
  /** Columns carried as epoch milliseconds on the wire (ua2sql.py:232–233). */
  val epochMillisColumns: Set[String] = Set("ts", "submit_time")
}
