package graft.sink

import graft.model.FeedSpec
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.types._

/** A batch table sink — the seam between the engine and its warehouse.
  * JDBC/PostgreSQL is the reference's target (ua2sql.py:88–91, 209–246);
  * parquet is the native analytics target and the one exercised in tests
  * (no PostgreSQL driver jar ships offline — SURVEY.md §7.4). */
trait BatchSink {
  def write(df: DataFrame, table: String): Unit
}

/** Parquet warehouse sink (directory per table). */
final class ParquetSink(root: String) extends BatchSink {
  override def write(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Append).parquet(s"$root/$table")
}

/**
 * JDBC sink with the reference's batching semantics: 1000-row buffered
 * inserts (ua2sql.py:238–246) become the jdbc writer's `batchsize`, applied
 * per partition in parallel rather than single-threaded.
 *
 * The target table should be pre-created with [[PgDdl.createTableSql]]
 * (Spark's `createTableColumnTypes` only accepts Spark SQL types, so the
 * PostgreSQL-specific INET/JSONB columns need real DDL, matching the
 * reference's create_all at ua2sql.py:91).
 */
final class JdbcSink(url: String, options: Map[String, String],
                     batchSize: Int = 1000) extends BatchSink {
  override def write(df: DataFrame, table: String): Unit = {
    val w = df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize.toString)
    options.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }
      .mode(SaveMode.Append)
      .save()
  }
}

/**
 * Idempotent PostgreSQL DDL for the reference schema — the declarative
 * twin of the SQLAlchemy Table definitions (ua2sql.py:37–91), including
 * the PG-specific types Spark cannot express (INET, JSONB) per the
 * SURVEY.md §1.2 mapping. `IF NOT EXISTS` ≙ metadata.create_all.
 */
object PgDdl {

  /** PG column type for one Spark field, feed-aware (ua2sql.py:46–86). */
  def pgType(field: StructField): String = field.name match {
    case "remote_ip" => "INET"
    case "custom_params" | "receipt" => "JSONB"
    case _ => field.dataType match {
      case TimestampType => "TIMESTAMP"
      case LongType => "BIGINT"
      case IntegerType => "INTEGER"
      case d: DecimalType => s"NUMERIC(${d.precision},${d.scale})"
      case DoubleType => "DOUBLE PRECISION"
      case StringType => "TEXT"
      case other => sys.error(s"no PG mapping for ${other.simpleString}")
    }
  }

  /** CREATE TABLE IF NOT EXISTS with a SERIAL surrogate id, mirroring the
    * reference's autoincrement primary keys (ua2sql.py:40,47,58,72). */
  def createTableSql(feed: FeedSpec): String = {
    val cols = feed.table.fields
      .map(f => s""""${f.name}" ${pgType(f)}""")
      .mkString(",\n  ")
    s"""CREATE TABLE IF NOT EXISTS "${feed.name}" (
       |  id SERIAL PRIMARY KEY,
       |  $cols
       |)""".stripMargin
  }

  /** The ledger table (ua2sql.py:39–44). */
  val jobLedgerSql: String =
    """CREATE TABLE IF NOT EXISTS "JobId" (
      |  id SERIAL PRIMARY KEY,
      |  "ts" TIMESTAMP,
      |  "jobId" TEXT,
      |  "jobType" TEXT
      |)""".stripMargin
}
