package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * SQL face of the engine: registers every fixture table as a temp view so
 * the whole operator surface is reachable through `spark.sql(...)` as well
 * as the DataFrame API (same Catalyst plans either way). Installing the
 * GroupTopK machinery here means SQL-written window-top-k idioms execute
 * on bounded heaps automatically (see plans/GroupTopKRewrite).
 */
object Views {

  val tables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register `<table>` views over `dir`; `events` gets the normalized
    * ts_ns/ms/ts columns from [[Tables.events]]. The custom function
    * families register alongside so SQL-face users get the full surface:
    * graft_cosine/graft_topk, graft_bloom_agg/graft_might_contain,
    * graft_freq_items, graft_countmin, and graft_phash128. */
  def register(spark: SparkSession, dir: String): Unit = {
    graft.plans.GroupTopK.install(spark)
    graft.functions.VectorFunctions.register(spark)
    graft.functions.BloomFunctions.register(spark)
    graft.functions.FrequentItems.register(spark)
    graft.functions.CountMin.register(spark)
    graft.functions.PHashFunctions.register(spark)
    graft.functions.StringSimilarity.register(spark)
    tables.foreach { name =>
      val df = if (name == "events") Tables.events(spark, dir)
               else Tables.t(spark, dir, name)
      df.createOrReplaceTempView(name)
    }
    registeredDir.put(spark, dir)
  }

  // One registration per session-and-dir: sql() is a hot entry point, and
  // re-reading 10 parquet footers + replacing 10 views per query is pure
  // churn. The views are session-global, so the cache tracks the CURRENT
  // dir per session — switching dirs re-registers (and invalidates the
  // other dir), and register() can always be called explicitly to force.
  private val registeredDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    if (registeredDir.get(spark) != dir) register(spark, dir)
    spark.sql(query)
  }
}
