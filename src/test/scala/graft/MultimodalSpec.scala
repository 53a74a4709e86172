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

  test("q206 aspect buckets: driver replay of dims, assignment, and batch math") {
    val got = SparkEntry.queries("q206_aspect_bucket_batches")(spark, sf0001)
      .collect().map(r => (r.getDouble(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0))
    val cuts = MultimodalQueries.AspectCuts.map(_.toDouble)
    val ladder = MultimodalQueries.AspectLadder.map(_.toDouble)
    val exp = ids.map { id =>
      val hex = md5hex(s"img:$id")
      val w = 256 + java.lang.Long.parseLong(hex.substring(0, 8), 16) % 1792
      val h = 256 + java.lang.Long.parseLong(hex.substring(8, 16), 16) % 1792
      val ar = w.toDouble / h
      ladder(cuts.indexWhere(ar < _) match { case -1 => ladder.length - 1; case i => i })
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got.keySet === exp.keySet)
    exp.foreach { case (bucket, n) =>
      val (tw, th, nImg, nBatch, pad) = got(bucket)
      assert(nImg === n, s"bucket $bucket count")
      assert(nBatch === (n + 31) / 32)
      assert(math.abs(pad - (nBatch * 32 - n).toDouble / (nBatch * 32)) < 1e-6)
      // equal-area targets: within one floor step of the 512x512 budget
      assert(tw * th <= 262144 && (tw + 1) * (th + 1) > 262144, s"bucket $bucket area ${tw * th}")
      assert(math.abs(tw.toDouble / th - bucket) < 0.01, s"bucket $bucket target aspect")
    }
    assert(got.values.map(_._3).sum === ids.length.toLong)
  }

  test("q237 scene cuts: per-video driver replay of frame signatures and cut runs") {
    import org.apache.spark.sql.functions.col
    val got = SparkEntry.queries("q237_scene_cuts")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .filter(!_.isNullAt(1)).map(r => r.getLong(0) -> r.getString(1))
    var checked = 0
    texts.foreach { case (id, txt) =>
      val nFrames = math.ceil(txt.length / 256.0).toInt
      if (nFrames > 0) {
        val sigs = (0 until nFrames).map { i =>
          val frame = txt.substring(i * 256, math.min((i + 1) * 256, txt.length))
          java.lang.Long.parseLong(md5hex(frame).substring(0, 8), 16)
        }
        val cutIdx = (1 until nFrames).filter { i =>
          java.lang.Long.bitCount(sigs(i) ^ sigs(i - 1)) >
            MultimodalQueries.SceneCutHamming
        }
        val (gn, gc, gFirst, gRate) = got(id)
        assert(gn === nFrames.toLong && gc === cutIdx.length.toLong, s"doc $id")
        assert(gFirst === cutIdx.headOption.map(_.toLong), s"doc $id first")
        if (nFrames > 1)
          assert(math.abs(gRate.get - cutIdx.length.toDouble / (nFrames - 1)) < 1e-6)
        else assert(gRate.isEmpty)
        checked += 1
      }
    }
    assert(checked === got.size)
    // with random signatures, cuts are the ~2.5% binomial tail: sparse but present
    val totalCuts = got.values.map(_._2).sum
    val totalGaps = got.values.map(_._1 - 1).sum
    assert(totalCuts > 0 && totalCuts < totalGaps / 5)
  }
}
