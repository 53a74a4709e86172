package graft

import graft.ops.DedupQueries
import org.scalatest.funsuite.AnyFunSuite

/** Cross-checks between the dedup family members on the sf0.001 fixture. */
class DedupSpec extends AnyFunSuite with SparkSuite {

  test("MinHash-LSH output equals the exact inverted-index pair set (recall 1 on fixture)") {
    val exact = DedupQueries.queries("q31_neardup_jaccard")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val lsh = DedupQueries.queries("q32_dedup_minhash_lsh")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(lsh === exact)
    assert(exact.nonEmpty, "fixture should contain planted near-duplicates")
  }

  test("exact dedup groups cover every document exactly once") {
    val total = spark.read.parquet(s"$sf0001/documents.parquet").count()
    val grouped = DedupQueries.queries("q30_dedup_exact")(spark, sf0001)
    val sumCopies = grouped.agg(org.apache.spark.sql.functions.sum("n_copies"))
      .collect().head.getLong(0)
    assert(sumCopies === total)
  }

  test("simhash pairs are valid: ordered, Hamming ≤ 3, no self-pairs") {
    val rows = DedupQueries.queries("q33_simhash_pairs")(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 3)
    }
  }

  test("simhash pigeonhole candidates cover ALL true Hamming<=3 pairs (exhaustive)") {
    // Exhaustive ground truth: every pair of signatures, straight Hamming.
    // If the chunked candidate join dropped even one true pair, q33 would
    // silently under-report — this pins recall = 1 for the pigeonhole
    // construction (4 chunks of 16 bits; 3 flipped bits can touch at most
    // 3 chunks, so one chunk always matches exactly).
    val sigs = DedupQueries.simhashDocs(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(sigs.length > 50, "fixture unexpectedly small")
    val truth = (for {
      (ida, sa) <- sigs
      (idb, sb) <- sigs if ida < idb
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ida, idb, h.toLong)).toSet
    val q33 = DedupQueries.queries("q33_simhash_pairs")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(q33 === truth)
    assert(truth.nonEmpty, "fixture should contain simhash near-duplicates")
  }

  test("near-dup jaccard values are within (0, 1] and pairs are distinct") {
    val rows = DedupQueries.queries("q31_neardup_jaccard")(spark, sf0001).collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.length === pairs.length)
    rows.foreach { r =>
      val j = r.getDouble(3)
      assert(j >= 0.5 && j <= 1.0)
    }
  }
}
