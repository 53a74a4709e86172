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
}
