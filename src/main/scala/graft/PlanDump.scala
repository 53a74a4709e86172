package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed physical plan of named registry queries
  * against a fixture dir — the quick feedback loop for PlanSpec guard
  * authoring and `.explain`-driven tuning.
  *
  * Usage: sbt "runMain graft.PlanDump <sfDir> <name>[,<name>...]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (dir, names) = (args(0), args(1).split(",").toSeq)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown query names: ${unknown.mkString(", ")}")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"==== $n ====")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan)
    }
    spark.stop()
  }
}
