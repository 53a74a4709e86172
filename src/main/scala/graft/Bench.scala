package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink materializes every column of every row (count() would let
    // Catalyst prune most of the plan and flatter the numbers); shared by
    // warmup and the timed loop so the two can never diverge.
    def runToNoop(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    // Untimed warmup: pay JVM/codegen/parquet-footer costs once so the
    // per-query numbers measure the plans, not JIT. One representative
    // per code-path family: scan+hash-agg (q01), typed flatMap + shuffle
    // join (q31), vector codegen + custom aggregate (q35b).
    for (w <- Seq("q01_pricing_summary", "q31_neardup_jaccard", "q35b_ann_topk_agg"))
      try runToNoop(w) catch { case _: Throwable => () }
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, _) =>
      val t0 = System.nanoTime()
      val ok =
        try { runToNoop(name); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed += name; false
        }
      // A query that fails to plan/execute must not contribute a flattering
      // near-zero timing: report it as -1 and list it in "failed".
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
