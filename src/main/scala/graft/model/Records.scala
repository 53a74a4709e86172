package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/**
 * Typed record classes mirroring the normalized feed tables
 * (ua2sql.py:46–86 via the SURVEY.md §1.2 mapping) — `Dataset[T]` at
 * module boundaries for compile-time schema safety (§1.5), `DataFrame`
 * inside the relational operators where schema is dynamic.
 */
final case class AppStart(
    ts: Timestamp, submit_time: Option[Timestamp], userid: String,
    remote_ip: Option[String], platform: Option[String],
    user_agent: Option[String], sdk_ver: Option[String])

final case class CustomEvent(
    ts: Timestamp, submit_time: Option[Timestamp], userid: String,
    remote_ip: Option[String], platform: Option[String],
    user_agent: Option[String], sdk_ver: Option[String],
    sessionid: Option[Long], name: Option[String], custom_params: Option[String])

final case class TransactionEvent(
    ts: Timestamp, submit_time: Option[Timestamp], userid: String,
    remote_ip: Option[String], platform: Option[String],
    user_agent: Option[String], sdk_ver: Option[String],
    sessionid: Option[Long], currency: Option[String],
    amount: Option[java.math.BigDecimal], transactionid: Option[String],
    productid: Option[String], receipt: Option[String])

final case class JobLedgerEntry(ts: Timestamp, jobId: String, jobType: String)

object Records {
  def appStarts(spark: SparkSession, df: DataFrame): Dataset[AppStart] = {
    import spark.implicits._; df.as[AppStart]
  }
  def customEvents(spark: SparkSession, df: DataFrame): Dataset[CustomEvent] = {
    import spark.implicits._; df.as[CustomEvent]
  }
  def transactions(spark: SparkSession, df: DataFrame): Dataset[TransactionEvent] = {
    import spark.implicits._; df.as[TransactionEvent]
  }
  def ledgerEntries(spark: SparkSession, df: DataFrame): Dataset[JobLedgerEntry] = {
    import spark.implicits._; df.as[JobLedgerEntry]
  }
}
