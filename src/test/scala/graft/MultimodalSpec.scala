package graft

import graft.ops.MultimodalQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: payload/metadata schema, batched stub decode,
  * frame sampling shape. */
class MultimodalSpec extends AnyFunSuite with SparkSuite {

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("binary payload carries byte-exact content with typed metadata") {
    val df = MultimodalQueries.withBinaryPayload(docs)
    assert(df.schema("payload").dataType.typeName === "binary")
    val r = df.select(col("doc_id"), col("meta.n_bytes").as("nb"),
        length(col("payload")).as("pl")).collect()
    r.foreach(row => assert(row.getAs[Long]("nb") === row.getAs[Int]("pl").toLong))
  }

  test("stub decode is deterministic, partition-batched, and total") {
    val a = MultimodalQueries.decode(spark, docs).collect().sortBy(_.doc_id)
    val b = MultimodalQueries.decode(spark, docs.repartition(7)).collect().sortBy(_.doc_id)
    assert(a.length === docs.count())
    assert(a.map(_.doc_id).toSeq === b.map(_.doc_id).toSeq)
    a.zip(b).foreach { case (x, y) =>
      assert(x.width === y.width && x.height === y.height)
      assert(x.feat.toSeq === y.feat.toSeq) // partitioning must not change results
      assert(x.feat.length === 8)
      x.feat.foreach(v => assert(v >= 0.0 && v < 1.0))
    }
  }

  test("stub resize bounds payloads to the target budget, deterministically") {
    val out = MultimodalQueries.resize(spark, docs, 16, 16).collect().sortBy(_.doc_id)
    assert(out.length === docs.count())
    val orig = MultimodalQueries.withBinaryPayload(docs)
      .select(col("doc_id"), length(col("payload")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { r =>
      assert(r.payload.length === math.min(orig(r.doc_id), 256))
      assert(r.format.endsWith(";resized=16x16"))
    }
    val again = MultimodalQueries.resize(spark, docs.repartition(5), 16, 16)
      .collect().sortBy(_.doc_id)
    out.zip(again).foreach { case (x, y) =>
      assert(x.payload.toSeq === y.payload.toSeq)
    }
  }

  test("resize budget survives large target dims (no Int overflow to zero)") {
    val out = MultimodalQueries.resize(spark, docs.limit(5), 65536, 65536).collect()
    val orig = MultimodalQueries.withBinaryPayload(docs.limit(5))
      .select(col("doc_id"), length(col("payload")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach(r => assert(r.payload.length === orig(r.doc_id),
      "a 65536x65536 budget must keep payloads, not empty them"))
    val err = intercept[IllegalArgumentException] {
      MultimodalQueries.resizeBatch(0, 16)(Iterator.empty)
    }
    assert(err.getMessage.contains("positive"))
  }

  test("frame sampling keeps every stride-th fixed-size chunk") {
    val sampled = MultimodalQueries.sampleFrames(
      MultimodalQueries.withBinaryPayload(docs), frameBytes = 64, stride = 2)
    val rows = sampled.select("doc_id", "frame_idx", "frame").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("frame_idx") % 2 === 0)
      assert(r.getAs[Array[Byte]]("frame").length <= 64)
    }
  }

  private def hamming128(a: Seq[Long], b: Seq[Long]): Int =
    a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum

  test("q89 phash pairs equal the exhaustive all-pairs Hamming<=7 set") {
    // Ground truth: every 128-bit signature pair, straight Hamming — if
    // the 8-chunk pigeonhole join dropped even one true pair (it can't,
    // for distances < 8), q89 would silently under-report.
    val sigs = MultimodalQueries.phashDocs(spark, docs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    assert(sigs.length > 50, "fixture unexpectedly small")
    val truth = (for {
      (ida, sa) <- sigs
      (idb, sb) <- sigs if ida < idb
      h = hamming128(sa, sb) if h <= 7
    } yield (ida, idb, h.toLong)).toSet
    val got = SparkEntry.queries("q89_phash_neardup")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === truth)
    assert(truth.nonEmpty, "fixture should contain payload near-duplicates")
  }

  test("phash separates near-dup payloads from unrelated ones") {
    // The signature is only useful if unrelated payloads stay far apart:
    // pin the median ALL-pairs distance well above the near-dup band so a
    // regression toward degenerate signatures (everything close) fails.
    val sigs = MultimodalQueries.phashDocs(spark, docs)
      .collect().map(r => r.getSeq[Long](1))
    val dists = (for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
    } yield hamming128(sigs(i), sigs(j))).sorted
    val median = dists(dists.length / 2)
    assert(median >= 20, s"median all-pairs Hamming $median — signatures degenerate")
    val nearBand = dists.count(_ <= 7)
    assert(nearBand > 0, "near-dup band empty at Hamming<=7 — threshold too tight for the 128-bit sketch")
  }
}
