package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object TopKBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    // ~60M rows, 10 groups: the regime where per-partition sorts cost
    val df = spark.range(60L * 1000 * 1000)
      .select(($"id" % 10).as("g"), (rand(7) * 1e9).as("score"), $"id")
      .localCheckpoint()
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f; f; f
      println(f"$tag: ${(System.nanoTime() - t0) / 3e9}%.2f s/run")
    }
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    time("window row_number<=10") {
      df.withColumn("rk", row_number().over(w)).filter($"rk" <= 10).drop("rk")
        .write.format("noop").mode("overwrite").save()
    }
    time("GroupTopK k=10") {
      graft.plans.GroupTopK(df, Seq($"g"), Seq($"score".desc, $"id".asc), 10)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
