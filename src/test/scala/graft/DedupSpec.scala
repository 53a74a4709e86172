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

  test("prefix filtering equals the exact pair set and prunes the candidate join") {
    // Exactness (the PPJoin theorem, not a recall argument): the prefix
    // rule may not drop ANY qualifying pair, and verification removes the
    // rest — so q131 must equal q31 row for row.
    val exact = DedupQueries.queries("q31_neardup_jaccard")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pf = DedupQueries.queries("q131_prefix_filter_jaccard")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pf === exact)
    assert(exact.nonEmpty, "fixture should contain planted near-duplicates")
    // Pruning power: the candidate set the verifier pays for must be
    // strictly smaller than the full df>1 inverted-index spine's pair set
    // (q31 verifies every shared-shingle pair; q131 only prefix collisions).
    val spine = DedupQueries.sharedPairCounts(spark, sf0001).count()
    val cand = DedupQueries.prefixFilterCandidates(
      DedupQueries.shingleRows(spark, sf0001)).count()
    assert(cand < spine, s"prefix candidates ($cand) should prune the spine ($spine)")
    assert(cand >= exact.size.toLong)
  }

  test("tf-idf prefix filter equals the dense all-pairs set and prunes the pair loop") {
    // Exactness (the All-Pairs bound, not a recall argument): the prefix
    // rule may not drop ANY qualifying pair; verification removes the
    // rest — so the registered composition (q245 ≡ q256 since the r10
    // demotion) must equal the SPEC-ONLY docs² brute-force witness row
    // for row.
    val exact = DedupQueries.tfidfBruteForcePairs(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pf = DedupQueries.queries("q245_tfidf_cosine_pairs")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pf === exact)
    assert(exact.nonEmpty, "fixture should contain tf-idf cosine near-dups")
    // Pruning power vs the dense loop's docs·(docs−1)/2 pairs — the
    // number the q131 reduction gate uses for the Jaccard family.
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("text").isNotNull).count()
    val all = docs * (docs - 1) / 2
    val cand = DedupQueries.tfidfPrefixCandidates(spark, sf0001).count()
    info(s"candidates $cand of $all dense pairs (${cand * 100.0 / all}%)")
    assert(cand < all, s"prefix candidates ($cand) should prune docs²/2 ($all)")
    assert(cand >= exact.size.toLong)
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

  /** Brute-force word-5-gram shingle sets per doc, straight Scala. */
  private def bruteShingles(): Map[Long, Set[String]] = {
    spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .filter(r => !r.isNullAt(1))
      .map { r =>
        val toks = r.getString(1).toLowerCase.split(" ", -1)
        r.getLong(0) -> toks.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
      }.toMap
  }

  test("containment pairs equal the exhaustive containment computation") {
    val sh = bruteShingles()
    val truth = (for {
      (ida, sa) <- sh.toSeq
      (idb, sb) <- sh.toSeq if ida < idb
      common = (sa intersect sb).size
      cont = common.toDouble / math.min(sa.size, sb.size) if cont >= 0.8
    } yield (ida, idb, common.toLong, cont)).toSet
    val q83 = graft.ops.DedupQueries.queries("q83_containment_neardup")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(q83 === truth)
    assert(truth.nonEmpty, "fixture should contain containment duplicates")
  }

  test("edit-distance near-dup pairs match an exhaustive Levenshtein check") {
    def lev(a: String, b: String): Int = {
      val prev = Array.tabulate(b.length + 1)(identity)
      val cur = new Array[Int](b.length + 1)
      for (i <- 1 to a.length) {
        cur(0) = i
        for (j <- 1 to b.length) {
          val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
          cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
        }
        Array.copy(cur, 0, prev, 0, cur.length)
      }
      prev(b.length)
    }
    val sh = bruteShingles()
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .filter(r => !r.isNullAt(1)).map(r => r.getLong(0) -> r.getString(1)).toMap
    val truth = (for {
      (ida, sa) <- sh.toSeq
      (idb, sb) <- sh.toSeq if ida < idb && (sa intersect sb).size >= 5
      e = lev(texts(ida), texts(idb))
      rel = e.toDouble / math.max(texts(ida).length, texts(idb).length) if rel <= 0.02
    } yield (ida, idb, e.toLong, rel)).toSet
    val q84 = graft.ops.DedupQueries.queries("q84_edit_neardup")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(q84 === truth)
    assert(truth.nonEmpty, "fixture should contain edit-distance near-duplicates")
  }

  test("incremental LSH equals the exact pair set restricted to new×index") {
    // Exact pairs from the oracle-checked exhaustive query, reordered to
    // (new, index); q85 must find exactly these — banding loses nothing.
    val exact = DedupQueries.queries("q31_neardup_jaccard")(spark, sf0001)
      .collect().flatMap { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        if (a % 10 < 2 && b % 10 >= 2) Some((a, b))
        else if (b % 10 < 2 && a % 10 >= 2) Some((b, a))
        else None
      }.toSet
    val inc = DedupQueries.queries("q85_incremental_lsh")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc === exact)
    assert(inc.nonEmpty, "fixture should contain new-vs-index near-duplicates")
    inc.foreach { case (n, i) => assert(n % 10 < 2 && i % 10 >= 2) }
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

  /** Plain-Scala winnowing reimplementation — the test-side oracle for the
    * typed mapPartitions fingerprinter (k=4 grams, md5 hex, w=5 window
    * lexicographic min, per-doc distinct). */
  private def winnowRef(text: String): Set[String] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val grams = text.toLowerCase.split(" ", -1).iterator.sliding(4).withPartial(false)
      .map(g => md.digest(g.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString).toSeq
    if (grams.length < 5) Set.empty
    else grams.sliding(5).map(_.min).toSet
  }

  test("winnowing fingerprints match an independent per-doc recomputation (exhaustive)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val got = DedupQueries.winnowFingerprints(docs)
      .collect().groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.map(_.getString(1)).toSet }
    val expect = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> winnowRef(r.getString(1))).toMap
      .filter(_._2.nonEmpty)
    assert(got === expect)
    assert(expect.values.map(_.size).sum > 0)
  }

  test("winnowing guarantee: a shared run of w+k-1 tokens yields a common fingerprint") {
    import spark.implicits._
    // 8 shared tokens (= w+k-1 for k=4, w=5) embedded in disjoint contexts;
    // doc 3 shares nothing with anyone.
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"aa bb cc dd ee ff gg hh $shared ii jj kk ll mm nn oo pp"),
      (2L, s"qq rr ss tt uu vv ww xx $shared yy zz a1 b2 c3 d4 e5 f6"),
      (3L, "p0 p1 p2 p3 p4 p5 p6 p7 p8 p9 r0 r1 r2 r3 r4 r5 r6 r7 r8 r9")
    ).toDF("doc_id", "text")
    val fps = DedupQueries.winnowFingerprints(docs)
      .collect().groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.map(_.getString(1)).toSet }
    assert((fps(1L) intersect fps(2L)).nonEmpty,
      "a shared 8-token run must contribute at least one identical fingerprint")
    assert((fps(1L) intersect fps(3L)).isEmpty)
    assert((fps(2L) intersect fps(3L)).isEmpty)
  }

  test("shingle novelty matches an exhaustive first-seen recomputation") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .filter(r => !r.isNullAt(1))
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ", -1)
        .iterator.sliding(5).withPartial(false).map(_.mkString(" ")).toSet)
      .sortBy(_._1)
    var seen = Set.empty[String]
    val want = docs.flatMap { case (id, sh) =>
      val out = if (sh.isEmpty) None else {
        val rep = sh.count(seen.contains)
        Some(id -> (sh.size.toLong, rep.toLong,
          BigDecimal(1.0 - rep.toDouble / sh.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
      seen ++= sh
      out
    }.toMap
    val got = DedupQueries.queries("q118_shingle_novelty")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got === want)
    assert(want.values.exists(_._2 > 0L),
      "fixture should contain at least one repeated shingle")
  }

  test("q285 exact-substring dedup: exhaustive driver recompute matches counts and residual digests") {
    import spark.implicits._
    val got = DedupQueries.queries("q285_exact_substring_dedup")(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().filter(_._2 != null)
    val L = 50
    // corpus-wide occurrence counts of every 50-char substring
    val occ = scala.collection.mutable.HashMap.empty[String, Int]
    docs.foreach { case (_, t) =>
      if (t.length >= L)
        t.sliding(L).foreach(g => occ(g) = occ.getOrElse(g, 0) + 1)
    }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    var removedSomething = false
    docs.foreach { case (id, t) =>
      val covered = Array.fill(t.length)(false)
      if (t.length >= L)
        (0 to t.length - L).foreach { i =>
          if (occ(t.substring(i, i + L)) >= 2)
            (i until i + L).foreach(covered(_) = true)
        }
      val residual = t.zipWithIndex.collect { case (c, i) if !covered(i) => c }.mkString
      val (nc, nr, nk, km) = got(id)
      assert(nc === t.length.toLong, s"doc $id n_chars")
      assert(nr === covered.count(identity).toLong, s"doc $id n_removed")
      assert(nk === residual.length.toLong, s"doc $id n_kept")
      assert(km === md5hex(residual), s"doc $id residual digest")
      if (nr > 0) removedSomething = true
    }
    assert(removedSomething, "fixture should contain duplicated 50-char substrings")
    // the sub-50-char gate: short docs can never be marked
    docs.filter(_._2.length < L).foreach { case (id, _) =>
      assert(got(id)._2 === 0L, s"short doc $id must keep everything")
    }
  }

  test("q245 tf-idf cosine: brute-force driver recompute finds the identical pair set") {
    import spark.implicits._
    val got = DedupQueries.queries("q245_tfidf_cosine_pairs")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .filter(_._2 != null)
    val tf: Map[Long, Map[String, Long]] = docs.map { case (id, txt) =>
      id -> txt.toLowerCase.split(" ", -1).toSeq.groupBy(identity)
        .view.mapValues(_.length.toLong).toMap
    }.toMap
    val n = tf.size.toLong
    val df = tf.values.flatMap(_.keys).toSeq.groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val w: Map[Long, Map[String, Long]] = tf.view.mapValues(_.map {
      case (tk, f) => tk -> (f * DedupQueries.TfidfQuantum * n) / df(tk)
    }).toMap.map(identity)
    val norm = w.view.mapValues(m =>
      math.sqrt(m.values.map(v => BigInt(v) * BigInt(v)).sum.toDouble)).toMap
    val ids = docs.map(_._1).sorted
    val thr = DedupQueries.TfidfCosMin.toDouble
    val want = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      shared = w(a).keySet.intersect(w(b).keySet)
      if shared.nonEmpty
      dot = shared.toSeq.map(tk => BigInt(w(a)(tk)) * BigInt(w(b)(tk))).sum
      cosv = dot.toDouble / (norm(a) * norm(b))
      if cosv >= thr
    } yield (a, b) -> (shared.size.toLong, cosv)).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, (ns, c)) =>
      assert(ns === want(k)._1, s"$k shared")
      assert(math.abs(c - want(k)._2) < 5e-6, s"$k cosine")
    }
    assert(got.nonEmpty, "fixture should contain sparse near-dups")
  }
}
