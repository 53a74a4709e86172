package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + determinism over the whole registered surface at sf0.001. */
class QueriesSpec extends AnyFunSuite with SparkSuite {

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query runs at sf0.001 and every oracle key is registered") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() >= 0, s"$name failed")
    }
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracleSql keys without a query: $unknown")
    // the registry is a ++ of per-module maps — a key collision would
    // silently drop a query
    val moduleSizes = Seq(graft.ops.CoreQueries.queries, graft.ops.DedupQueries.queries,
      graft.ops.SimilarityQueries.queries, graft.ops.SimilarityQueries.extraQueries,
      graft.ops.TextQueries.queries, graft.ops.MultimodalQueries.queries,
      graft.ops.CurationQueries.queries).map(_.size).sum
    assert(SparkEntry.queries.size === moduleSizes, "query name collision between modules")
  }

  test("representative queries are deterministic across runs") {
    for (name <- Seq("q01_pricing_summary", "q03_latest_event_per_user",
                     "q31_neardup_jaccard", "q35_ann_topk")) {
      val a = SparkEntry.queries(name)(spark, sf0001).collect().toSeq
      val b = SparkEntry.queries(name)(spark, sf0001).collect().toSeq
      assert(a === b, s"$name not deterministic")
    }
  }
}
