package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.StatsQueries

/**
 * Independent recomputes for the statistics / mining family (q158–q168).
 * Each test rebuilds the expected answer driver-side from the raw fixture
 * (different code path: Scala collections, no Catalyst) and compares —
 * the DuckDB oracle gate then cross-checks the same queries engine-to-
 * engine at sf0.01.
 */
class StatsSpec extends AnyFunSuite with SparkSuite {

  private def q(name: String) = StatsQueries.queries(name)(spark, sf0001)

  test("q165 PageRank: ranks are a probability distribution and uniform-start iterates match a driver recompute") {
    import spark.implicits._
    val got = q("q165_brand_pagerank").as[(String, Double)].collect().toMap
    assert(math.abs(got.values.sum - 1.0) < 1e-3, s"ranks should sum to ~1, got ${got.values.sum}")
    assert(got.values.forall(r => r > 0 && r < 1))

    // Driver recompute from the raw tables.
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
    val brandOf = spark.read.parquet(s"$sf0001/part.parquet")
      .select($"p_partkey", $"p_brand").as[(Long, String)].collect().toMap
    val baskets = li.map { case (ok, pk) => (ok, brandOf(pk)) }.distinct
    val byOrder = baskets.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val edges = scala.collection.mutable.Map.empty[(String, String), Long]
    byOrder.values.foreach { bs =>
      for (a <- bs; b <- bs if a != b) edges((a, b)) = edges.getOrElse((a, b), 0L) + 1
    }
    val brands = brandOf.values.toSeq.distinct.sorted
    val nb = brands.size
    val outw = edges.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    var r = brands.map(_ -> 1.0 / nb).toMap
    for (_ <- 1 to 3) {
      val m = scala.collection.mutable.Map.empty[String, Double]
      edges.foreach { case ((src, dst), w) =>
        m(dst) = m.getOrElse(dst, 0.0) + w.toDouble / outw(src) * r(src)
      }
      r = brands.map(b => b -> (0.15 / nb + 0.85 * m.getOrElse(b, 0.0))).toMap
    }
    brands.foreach { b =>
      assert(math.abs(got(b) - r(b)) < 1e-6, s"brand $b: got ${got(b)}, want ${r(b)}")
    }
  }

  test("q159 Mann–Whitney: U and z match a brute-force midrank recompute") {
    import spark.implicits._
    val row = q("q159_mann_whitney_u").collect().head
    val (nA, nB, u2, tie) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val vals = spark.read.parquet(s"$sf0001/orders.parquet")
      .filter($"o_orderpriority".isin("1-URGENT", "5-LOW"))
      .select(($"o_orderpriority" === "1-URGENT").as("a"),
        round($"o_totalprice" * 100).cast("long").as("v"))
      .as[(Boolean, Long)].collect()
    assert(nA === vals.count(_._1) && nB === vals.count(!_._1))
    // midranks over the sorted pooled sample
    val sorted = vals.sortBy(_._2)
    val rankOf = sorted.zipWithIndex.groupBy(_._1._2).map { case (v, xs) =>
      v -> xs.map(_._2 + 1).sum.toDouble / xs.size
    }
    val rA = vals.filter(_._1).map(x => rankOf(x._2)).sum
    val wantU2 = math.round(2 * (rA - nA * (nA + 1) / 2.0))
    assert(u2 === wantU2, s"U2: got $u2 want $wantU2")
    val tiesWant = vals.groupBy(_._2).values.map(_.size.toLong)
      .map(t => t * t * t - t).sum
    assert(tie === tiesWant)
    val z = row.getDouble(4)
    val n = nA + nB
    val sigma = math.sqrt(nA.toDouble * nB / 12.0 *
      ((n + 1) - tie.toDouble / (n.toDouble * (n - 1))))
    val wantZ = (u2 - nA.toDouble * nB) / (2 * sigma)
    assert(math.abs(z - wantZ) < 1e-5, s"z: got $z want $wantZ")
  }

  test("q164 EWMA equals the windowed recursive recompute on the collected day series") {
    import spark.implicits._
    val got = q("q164_ewma_revenue")
      .select($"d".cast("string"), $"rev_cents", $"ewma_cents_e4")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    val series = got.map { case (d, c, _) => (d, c) }
    // windowed EWMA with α=1/2 over the 21-day calendar window:
    // exact integer num/den, floor((num*1e4)/den)
    val byDay = series.toMap
    got.foreach { case (d, _, e4) =>
      val day = java.time.LocalDate.parse(d)
      var num = BigInt(0); var den = BigInt(0)
      for (off <- 0 to 20) {
        byDay.get(day.minusDays(off.toLong).toString).foreach { c =>
          val w = BigInt(1) << (20 - off)
          num += BigInt(c) * w; den += w
        }
      }
      val want = (num * 10000 / den).toLong
      assert(e4 === want, s"day $d: got $e4 want $want")
    }
  }

  test("q160 chi-square: expected margins reproduce the observed margins") {
    import spark.implicits._
    val cells = q("q160_chi_square_cells")
      .select($"o_orderpriority", $"obs", $"expected", $"contrib")
      .as[(String, Long, Double, Double)].collect()
    val n = cells.map(_._2).sum
    // Σ expected == n (within rounding grain), every contrib ≥ 0
    assert(math.abs(cells.map(_._3).sum - n) < 1e-3)
    assert(cells.forall(_._4 >= 0.0))
    // per-priority expected margin equals observed margin
    cells.groupBy(_._1).foreach { case (_, xs) =>
      assert(math.abs(xs.map(_._3).sum - xs.map(_._2).sum) < 1e-3)
    }
  }

  test("q161 Benford: observed frequencies sum to 1, digits are 1..9") {
    import spark.implicits._
    val rows = q("q161_benford_digits")
      .select($"digit", $"obs_freq").as[(Int, Double)].collect()
    assert(rows.map(_._1).forall(d => d >= 1 && d <= 9))
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-4)
  }

  test("q166 sorted-neighborhood: every reported pair verifies under the edit threshold; near-dups exist") {
    import spark.implicits._
    val pairs = q("q166_sorted_neighborhood")
      .as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty, "fixture near-dup structure should yield at least one SNM pair")
    assert(pairs.forall { case (a, b, _) => a < b })
    assert(pairs.distinct.length === pairs.length)
    val text = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    pairs.foreach { case (a, b, dist) =>
      val (ta, tb) = (text(a), text(b))
      assert(lev(ta, tb) === dist, s"pair ($a,$b) distance mismatch")
      assert(dist <= math.floor(0.3 * math.max(ta.length, tb.length)).toLong)
    }
  }

  test("q167 trigram counts match a naive sessionized recompute") {
    import spark.implicits._
    val got = q("q167_session_trigrams").as[(String, Long)].collect()
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select($"user_id",
        (unix_micros($"ts".cast("timestamp")) / 1000).cast("long").as("ms"),
        $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect()
    val gap = 30L * 60 * 1000
    val counts = scala.collection.mutable.Map.empty[String, Long]
    ev.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      var sess = Vector.empty[Vector[String]]
      var last = Long.MinValue
      sorted.foreach { r =>
        if (last == Long.MinValue || r._2 - last >= gap)
          sess :+= Vector(r._4)
        else sess = sess.init :+ (sess.last :+ r._4)
        last = r._2
      }
      sess.foreach(_.sliding(3).filter(_.size == 3).foreach { t =>
        val k = t.mkString(">")
        counts(k) = counts.getOrElse(k, 0L) + 1
      })
    }
    val want = counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(20)
    assert(got.toSeq === want)
  }

  test("q168 Gini matches the classic sorted-sum recompute and is in [0,1)") {
    import spark.implicits._
    val row = q("q168_gini_spend").collect().head
    val (n, tot, gini) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    val spend = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy($"o_custkey")
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("c"))
      .select($"o_custkey", $"c").as[(Long, Long)].collect()
    assert(n === spend.length && tot === spend.map(_._2).sum)
    val sorted = spend.sortBy(x => (x._2, x._1)).map(_._2)
    val s = sorted.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val want = 2.0 * s.toDouble / (n.toDouble * tot) - (n + 1).toDouble / n
    assert(math.abs(gini - want) < 1e-6)
    assert(gini >= 0.0 && gini < 1.0)
  }

  test("q169 changepoint matches an exhaustive driver-side split search") {
    import spark.implicits._
    val row = q("q169_revenue_changepoint").collect().head
    val series = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy(to_date($"o_orderdate").as("d"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("c"))
      .select($"d".cast("string"), $"c").as[(String, Long)].collect().sortBy(_._1)
    val n = series.length
    val prefix = series.map(_._2).scanLeft(0L)(_ + _).tail
    val tot = prefix.last
    val best = (7 to n - 7).map { i =>
      val p = prefix(i - 1)
      val score = math.sqrt(i.toDouble * (n - i) / n) *
        math.abs(p.toDouble / i - (tot - p).toDouble / (n - i))
      (score, series(i - 1)._1, i)
    }.maxBy { case (s, d, _) => (s, d) }
    assert(row.getDate(0).toString === best._2)
    assert(row.getLong(1) === best._3.toLong)
    assert(math.abs(row.getDouble(5) - best._1) < 1e-9)
  }

  test("q170 triangle counts match a brute-force enumeration") {
    import spark.implicits._
    val got = q("q170_brand_triangles").as[(String, Long)].collect().toMap
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
    val brandOf = spark.read.parquet(s"$sf0001/part.parquet")
      .select($"p_partkey", $"p_brand").as[(Long, String)].collect().toMap
    val edges = li.map { case (ok, pk) => (ok, brandOf(pk)) }.distinct
      .groupBy(_._1).values.flatMap { bs =>
        val b = bs.map(_._2).distinct.sorted
        for (i <- b.indices; j <- i + 1 until b.size) yield (b(i), b(j))
      }.toSet
    val nodes = brandOf.values.toSeq.distinct.sorted
    val want = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for (i <- nodes.indices; j <- i + 1 until nodes.size; k <- j + 1 until nodes.size) {
      val (x, y, z) = (nodes(i), nodes(j), nodes(k))
      if (edges((x, y)) && edges((y, z)) && edges((x, z))) {
        want(x) += 1; want(y) += 1; want(z) += 1
      }
    }
    nodes.foreach(b => assert(got(b) === want(b), s"brand $b"))
  }

  test("q171 LLR matches an independent contingency recompute; LLR is nonnegative") {
    import spark.implicits._
    val got = q("q171_llr_collocations").as[(String, String, Long, Double)].collect()
    assert(got.nonEmpty && got.forall(_._4 >= -1e-9))
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"text").as[String].collect()
    val bigrams = docs.flatMap(_.toLowerCase.split(" ").sliding(2).collect {
      case Array(a, b) => (a, b)
    })
    val k11 = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rC = bigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cC = bigrams.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nBi = bigrams.length.toLong
    def term(k: Long, row: Long, c: Long): Double =
      if (k > 0) k.toDouble * math.log(k.toDouble * nBi / (row.toDouble * c)) else 0.0
    got.foreach { case (p, t0, cBi, llr) =>
      assert(cBi === k11((p, t0)))
      val (r, c) = (rC(p), cC(t0))
      val want = 2.0 * (term(cBi, r, c) + term(r - cBi, r, nBi - c) +
        term(c - cBi, nBi - r, c) + term(nBi - r - c + cBi, nBi - r, nBi - c))
      assert(math.abs(llr - want) < 1e-4, s"($p,$t0): got $llr want $want")
    }
  }

  test("q172 Zipf slope is negative and matches the collected-histogram OLS") {
    import spark.implicits._
    val row = q("q172_zipf_slope").collect().head
    val (nW, slope, intercept) = (row.getLong(0), row.getDouble(1), row.getDouble(2))
    assert(slope < 0.0, "word frequencies must decay with rank")
    val hist = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(split(lower($"text"), " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect()
    val pts = hist.sortBy { case (w, c) => (-c, w) }.take(200).zipWithIndex
      .map { case ((_, c), i) => (math.log(i + 1.0), math.log(c.toDouble)) }
    val n = pts.length
    assert(nW === n.toLong)
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val (sxy, sxx) = (pts.map(p => p._1 * p._2).sum, pts.map(p => p._1 * p._1).sum)
    val slopeW = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(slope - slopeW) < 1e-5)
    assert(math.abs(intercept - (sy - slopeW * sx) / n) < 1e-5)
  }

  test("q173 audience overlap matches collected user-set intersections") {
    import spark.implicits._
    val got = q("q173_audience_overlap")
      .as[(String, String, Long, Long, Long, Double)].collect()
    val sets = spark.read.parquet(s"$sf0001/events.parquet")
      .select($"event_type", $"user_id").distinct()
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    got.foreach { case (a, b, na, nb, both, jac) =>
      assert(a < b)
      assert(na === sets(a).size.toLong && nb === sets(b).size.toLong)
      val inter = (sets(a) & sets(b)).size.toLong
      assert(both === inter)
      val want = inter.toDouble / (na + nb - inter)
      assert(math.abs(jac - want) < 1e-6)
    }
  }

  test("q174 manifest pruning skips files and never changes results") {
    import spark.implicits._
    import graft.ops.Layout
    val root = java.nio.file.Files.createTempDirectory("graft-manifest-spec").toString
    try {
      Layout.sortedShards(
          spark.read.parquet(s"$sf0001/orders.parquet")
            .select($"o_orderkey", $"o_totalprice"),
          Seq("o_totalprice"), 8)
        .write.mode("overwrite").parquet(root)
      val man = Layout.statsManifest(spark, root, "o_totalprice")
      assert(man.length === 8)
      val (scan, kept, total) =
        Layout.prunedRangeScan(spark, "o_totalprice", 50000.0, 100000.0, man)
      assert(kept < total, s"pruning should skip files ($kept/$total read)")
      val full = spark.read.parquet(root)
        .filter($"o_totalprice" >= 50000.0 && $"o_totalprice" < 100000.0)
      assert(scan.count() === full.count())
      assert(scan.agg(sum($"o_orderkey")).head.getLong(0) ===
        full.agg(sum($"o_orderkey")).head.getLong(0))
      // empty intersection degenerates to zero rows, not an error
      val (none, k0, _) =
        Layout.prunedRangeScan(spark, "o_totalprice", 1e12, 2e12, man)
      assert(k0 === 0 && none.count() === 0L)
    } finally {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(del)
        f.delete(): Unit
      }
      del(new java.io.File(root))
    }
  }

  test("q175 Kaplan-Meier matches an independent life-table recompute") {
    import spark.implicits._
    val got = q("q175_kaplan_meier")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select($"user_id",
        (unix_micros($"ts".cast("timestamp")) / 1000).cast("long").as("ms"),
        $"event_type")
      .as[(Long, Long, String)].collect()
    val signup = ev.filter(_._3 == "signup").groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val maxMs = ev.map(_._2).max
    val durs = signup.toSeq.map { case (u, st) =>
      val p = ev.filter(e => e._1 == u && e._3 == "purchase" && e._2 >= st)
      if (p.nonEmpty) ((p.map(_._2).min - st) / 86400000L, 1L)
      else ((maxMs - st) / 86400000L, 0L)
    }
    val lt = durs.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, xs) =>
      (d, xs.count(_._2 == 1L).toLong, xs.count(_._2 == 0L).toLong)
    }
    var atRisk = durs.size.toLong
    var sKm = 1.0
    val want = lt.map { case (d, conv, cens) =>
      val n = atRisk
      sKm *= 1.0 - conv.toDouble / n
      atRisk -= conv + cens
      (d, n, conv, cens, sKm)
    }
    assert(got.length === want.length)
    got.zip(want).foreach { case ((d, n, cv, cs, s), (wd, wn, wcv, wcs, ws)) =>
      assert(d === wd && n === wn && cv === wcv && cs === wcs)
      assert(math.abs(s - ws) < 1e-6)
    }
    // survival is monotone nonincreasing from 1
    assert(got.map(_._5).zip(got.map(_._5).tail).forall { case (a, b) => b <= a + 1e-9 })
  }

  test("q176 k-anonymity violations match a collected recount") {
    import spark.implicits._
    val got = q("q176_k_anonymity")
      .as[(Int, String, Long, Long, Long)].collect()
    val groups = spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_nationkey", $"c_mktsegment",
        floor($"c_acctbal" / 1000.0).cast("long").as("b"))
      .as[(Int, String, Long)].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val kTable = groups.values.min
    val wantViol = groups.filter(_._2 < 5)
    assert(got.length === wantViol.size)
    got.foreach { case (n, seg, band, sz, k) =>
      assert(k === kTable)
      assert(wantViol((n, seg, band)) === sz)
    }
  }

  test("q177 day-of-week indices average to 1 weighted by day counts") {
    import spark.implicits._
    val rows = q("q177_dow_seasonality")
      .as[(Int, Long, Long, Double)].collect()
    assert(rows.map(_._1).sorted.sameElements(0 to 6))
    val ndTot = rows.map(_._2).sum
    val tot = rows.map(_._3).sum
    // Σ n_days·idx·(tot/nd_tot) == Σ rev  ⇒  weighted mean of idx is 1
    val wmean = rows.map(r => r._2 * r._4).sum / ndTot
    assert(math.abs(wmean - 1.0) < 1e-4, s"weighted mean $wmean")
    rows.foreach { case (_, nd, rev, idx) =>
      val want = rev.toDouble * ndTot / (nd.toDouble * tot)
      assert(math.abs(idx - want) < 1e-5)
    }
  }

  test("q178 repair projection respects the audited thresholds") {
    import spark.implicits._
    val audit = q("q178_repair_audit")
      .as[(String, Long, Long, Long, Double, Double)].collect()
    val th = audit.map { case (seg, _, _, _, med, p99) => seg -> (med, p99) }.toMap
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_mktsegment", $"c_acctbal").as[(String, Double)].collect()
    audit.foreach { case (seg, n, nImp, nCap, med, p99) =>
      val xs = cust.filter(_._1 == seg).map(_._2)
      assert(n === xs.length.toLong)
      assert(nImp === xs.count(_ < 0).toLong)
      assert(nCap === xs.count(_ > p99).toLong)
      assert(med >= 0 && med <= p99)
    }
    // applying the repair: every cleaned value lies in [0, p99]
    cust.foreach { case (seg, x) =>
      val (med, p99) = th(seg)
      val clean = if (x < 0) med else math.min(x, p99)
      assert(clean >= 0.0 && clean <= p99)
    }
  }

  test("q179 chunks cover every word with stride overlap and digest-match a driver rechunk") {
    import spark.implicits._
    val got = q("q179_rag_chunks").as[(Long, Int, Int, String)].collect()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .filter(_._2 != null)
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val want = docs.flatMap { case (id, text) =>
      val ws = text.toLowerCase.split(" ", -1)
      val nChunks = (ws.length - 1) / 48 + 1
      (0 until nChunks).map { g =>
        val chunk = ws.slice(g * 48, g * 48 + 64)
        (id, g, chunk.length, md5(chunk.mkString(" ")))
      }
    }
    assert(got.sortBy(r => (r._1, r._2)).toSeq === want.sortBy(r => (r._1, r._2)).toSeq)
    // stride 48 < chunk 64 ⇒ chunk g covers words [48g, 48g+64) and the
    // last chunk's start lies within the doc — so every word is covered
    val lens = docs.map { case (id, tx) => id -> tx.toLowerCase.split(" ", -1).length }.toMap
    got.groupBy(_._1).foreach { case (id, cs) =>
      val maxIdx = cs.map(_._2).max
      assert(maxIdx * 48 < lens(id))
      assert((maxIdx + 1) * 48 >= lens(id) || maxIdx * 48 + 64 >= lens(id))
    }
  }

  test("q180 PII audit: fixture is PII-free, digit runs present, redaction removes all matches") {
    import spark.implicits._
    val got = q("q180_pii_audit")
      .as[(String, String, Long, Long, Long)].collect()
    assert(got.length === 8)
    got.foreach { case (_, pat, scanned, rows, occ) =>
      assert(scanned > 0 && rows >= 0 && occ >= rows * 0)
      if (pat != "digit_run") assert(rows === 0L, s"fixture should be $pat-free")
    }
    val dr = got.filter(_._2 == "digit_run")
    assert(dr.exists(_._4 > 0), "props digit runs should be detected")
    // redaction projection on synthetic PII rows: nothing survives
    val synth = Seq(
      "contact me at jane.doe+x@example.com or +14155550123",
      "server 192.168.10.20 responded, ticket 99887766").toDF("s")
    val pats = Seq(
      "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}",
      "([0-9]{1,3}[.]){3}[0-9]{1,3}",
      "[+][0-9]{7,15}",
      "[0-9]{2,}")
    val red = pats.foldLeft(synth)((df, p) =>
      df.withColumn("s", regexp_replace($"s", p, "[REDACTED]")))
    val survivors = pats.map(p =>
      red.filter(size(regexp_extract_all($"s", lit(p), lit(0))) > 0).count()).sum
    assert(survivors === 0L)
  }

  test("q181 logistic regression matches a driver-side gradient-descent replay") {
    import spark.implicits._
    val got = q("q181_logreg_quality").as[(String, Double)].collect().toMap
    val rawFeats = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter($"text".isNotNull)
      .select($"lang", $"text").as[(String, String)].collect()
      .map { case (lang, text) =>
        val ws = text.toLowerCase.split(" ", -1)
        val y = if (lang == "en") 1.0 else 0.0
        (y, Array(text.length.toDouble / ws.length,
          ws.count(w => w == "the" || w == "a").toDouble / ws.length,
          ws.distinct.length.toDouble / ws.length))
      }
    val n0 = rawFeats.length
    val mus = (0 until 3).map(i => rawFeats.map(_._2(i)).sum / n0)
    val sds = (0 until 3).map(i =>
      math.sqrt(rawFeats.map(f => math.pow(f._2(i) - mus(i), 2)).sum / n0))
    val feats = rawFeats.map { case (y, r) =>
      (y, Array(1.0, (r(0) - mus(0)) / sds(0), (r(1) - mus(1)) / sds(1),
        (r(2) - mus(2)) / sds(2)))
    }
    var w = Array(0.0, 0.0, 0.0, 0.0)
    var loss = 0.0
    var prevLoss = Double.MaxValue
    for (_ <- 1 to 25) {
      val g = Array(0.0, 0.0, 0.0, 0.0)
      loss = 0.0
      feats.foreach { case (y, x) =>
        val p = 1.0 / (1.0 + math.exp(-(w, x).zipped.map(_ * _).sum))
        (0 until 4).foreach(i => g(i) += (p - y) * x(i))
        loss += -(y * math.log(p) + (1 - y) * math.log(1 - p))
      }
      (0 until 4).foreach(i => w(i) -= 0.5 * g(i) / feats.length)
      loss /= feats.length
      assert(loss < prevLoss + 1e-9, "loss must not increase")
      prevLoss = loss
    }
    (0 until 4).foreach(i =>
      assert(math.abs(got(s"w$i") - w(i)) < 1e-4, s"w$i: ${got(s"w$i")} vs ${w(i)}"))
    assert(math.abs(got("train_loss") - loss) < 1e-4)
    val majority = math.max(feats.count(_._1 == 1.0), feats.count(_._1 == 0.0))
      .toDouble / feats.length
    assert(got("train_acc") >= majority - 0.05,
      s"accuracy ${got("train_acc")} should not trail the majority class $majority")
  }

  test("q182 jackknife matches an independent MD5-bucket recompute") {
    import spark.implicits._
    val row = q("q182_jackknife_ci").collect().head
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_custkey", round($"o_totalprice" * 100).cast("long").as("c"))
      .as[(Long, Long)].collect()
    def bucket(k: Long): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.take(8), 16) % 32).toInt
    }
    val byB = orders.groupBy(o => bucket(o._1)).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._2).sum)).toMap
    val n = orders.length.toLong
    val sc = orders.map(_._2).sum
    val g = byB.size
    val thetas = byB.values.map { case (ng, sg) => (sc - sg).toDouble / (n - ng) }
    val tbar = thetas.sum / g
    val se = math.sqrt((g - 1).toDouble / g * thetas.map(t => (t - tbar) * (t - tbar)).sum)
    assert(row.getLong(0) === n && row.getLong(1) === g.toLong)
    assert(math.abs(row.getDouble(2) - sc.toDouble / n) < 1e-4)
    assert(math.abs(row.getDouble(3) - se) < 1e-4)
  }

  test("q183 padding waste: length-sorted batching never wastes more than arrival order") {
    import spark.implicits._
    val rows = q("q183_padding_waste")
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (arr, srt) = (rows("arrival"), rows("length_sorted"))
    assert(arr._2 === srt._2 && arr._4 === srt._4, "same docs, same total tokens")
    assert(srt._5 <= arr._5, "sorting by length cannot increase padding")
    // independent recompute of both strategies
    val toks = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter($"text".isNotNull)
      .select($"doc_id", size(split(lower($"text"), " ")).cast("long").as("n"))
      .as[(Long, Long)].collect()
    def padded(sorted: Seq[Long]): Long =
      sorted.grouped(32).map(b => b.length * b.max).sum
    assert(arr._5 === padded(toks.sortBy(_._1).map(_._2).toSeq))
    assert(srt._5 === padded(toks.sortBy(t => (t._2, t._1)).map(_._2).toSeq))
  }

  // (No lag7-beats-lag1 assertion: it holds at sf0.01+ where the weekly
  // signal emerges, but not on the sparse sf0.001 series this spec uses.)
  test("q184 backtest MAE/MAPE match an independent calendar-lag recompute") {
    import spark.implicits._
    val rows = q("q184_seasonal_naive_backtest")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val day = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy(to_date($"o_orderdate").as("d"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("c"))
      .select($"d".cast("string"), $"c").as[(String, Long)].collect()
      .map { case (d, c) => java.time.LocalDate.parse(d) -> c }.toMap
    Seq(1, 7).foreach { lag =>
      val scored = day.toSeq.flatMap { case (d, c) =>
        day.get(d.minusDays(lag.toLong)).map(p => (c, p))
      }
      val (n, mae, mape) = rows(s"lag$lag") match { case (_, a, b, c2) => (a, b, c2) }
      assert(n === scored.size.toLong)
      val sad = scored.map { case (a, p) => math.abs(a - p) }.map(BigInt(_)).sum
      assert(mae === (sad * 10000 / n).toLong)
      val wantMape = scored.map { case (a, p) => math.abs(a - p).toDouble / a }.sum / n
      assert(math.abs(mape - wantMape) < 1e-5)
    }
  }

  test("q185 join-size identity equals the materialized join's row count") {
    import spark.implicits._
    val row = q("q185_join_size_estimate").collect().head
    val o = spark.read.parquet(s"$sf0001/orders.parquet").select($"o_orderkey")
    val l = spark.read.parquet(s"$sf0001/lineitem.parquet").select($"l_orderkey")
    val actual = o.join(l, $"o_orderkey" === $"l_orderkey").count()
    assert(row.getLong(0) === actual, "Σ cA·cB must equal the real join size")
    assert(row.getLong(1) > 0 && row.getDouble(2) >= 0.0)
    // the 1/16 key sample should land within a loose error band
    assert(row.getDouble(2) < 0.5, s"sampled estimate off by ${row.getDouble(2)}")
  }

  /** Driver-side GD replay shared by the classifier-family tests —
    * identical to the query-side trainer by construction. */
  private def trainReplay(): (Seq[Double], Seq[(Long, Double, Array[Double])]) = {
    import spark.implicits._
    val rawFeats = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter($"text".isNotNull)
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)].collect()
      .map { case (id, lang, text) =>
        val ws = text.toLowerCase.split(" ", -1)
        (id, if (lang == "en") 1.0 else 0.0,
          Array(text.length.toDouble / ws.length,
            ws.count(w => w == "the" || w == "a").toDouble / ws.length,
            ws.distinct.length.toDouble / ws.length))
      }
    val n0 = rawFeats.length
    val mus = (0 until 3).map(i => rawFeats.map(_._3(i)).sum / n0)
    val sds = (0 until 3).map(i =>
      math.sqrt(rawFeats.map(f => math.pow(f._3(i) - mus(i), 2)).sum / n0))
    val feats = rawFeats.map { case (id, y, r) =>
      (id, y, Array(1.0, (r(0) - mus(0)) / sds(0), (r(1) - mus(1)) / sds(1),
        (r(2) - mus(2)) / sds(2)))
    }
    var w = Seq(0.0, 0.0, 0.0, 0.0)
    for (_ <- 1 to 25) {
      val g = Array(0.0, 0.0, 0.0, 0.0)
      feats.foreach { case (_, y, x) =>
        val p = 1.0 / (1.0 + math.exp(-w.zip(x).map { case (a, b) => a * b }.sum))
        (0 until 4).foreach(i => g(i) += (p - y) * x(i))
      }
      w = w.zipWithIndex.map { case (wi, i) => wi - 0.5 * g(i) / feats.length }
    }
    (w, feats.toIndexedSeq)
  }

  test("q186 gains table matches an independent rank-and-fold replay") {
    import spark.implicits._
    val got = q("q186_classifier_gains")
      .as[(Long, Long, Long, Double, Double, Double)].collect().sortBy(_._1)
    val (w, feats) = trainReplay()
    val scored = feats.map { case (id, y, x) =>
      (id, y, w.zip(x).map { case (a, b) => a * b }.sum)
    }.sortBy { case (id, _, sc) => (-sc, id) }
    val n = scored.length
    // SQL NTILE sizes: first (n mod 10) deciles get one extra row
    val (q10, r10) = (n / 10, n % 10)
    val sizes = (1 to 10).map(d => if (d <= r10) q10 + 1 else q10)
    var idx = 0
    val totPos = scored.map(_._2).sum
    var cum = 0.0
    got.zip(sizes).zipWithIndex.foreach { case (((d, nD, nP, rate, rec, lift), sz), i) =>
      assert(d === (i + 1).toLong && nD === sz.toLong)
      val pos = scored.slice(idx, idx + sz).map(_._2).sum
      idx += sz
      cum += pos
      assert(nP === pos.toLong)
      assert(math.abs(rate - pos / sz) < 1e-6)
      assert(math.abs(rec - cum / totPos) < 1e-6)
      assert(math.abs(lift - (pos / sz) / (totPos / n)) < 1e-6)
    }
    // gains must be monotone: recall non-decreasing, top decile ≥ base rate
    assert(got.map(_._5).zip(got.map(_._5).tail).forall { case (a, b) => b >= a - 1e-9 })
  }

  test("q187 AUC matches brute-force pair counting with midrank ties") {
    import spark.implicits._
    val row = q("q187_classifier_auc").collect().head
    val (w, feats) = trainReplay()
    val scored = feats.map { case (_, y, x) =>
      (y, w.zip(x).map { case (a, b) => a * b }.sum)
    }
    val pos = scored.filter(_._1 == 1.0).map(_._2)
    val neg = scored.filter(_._1 == 0.0).map(_._2)
    var num = 0.0
    for (p <- pos; q0 <- neg)
      num += (if (p > q0) 1.0 else if (p == q0) 0.5 else 0.0)
    val want = num / (pos.length.toDouble * neg.length)
    assert(row.getLong(0) === pos.length.toLong && row.getLong(1) === neg.length.toLong)
    assert(math.abs(row.getDouble(2) - want) < 1e-6, s"AUC ${row.getDouble(2)} vs $want")
    assert(row.getDouble(2) > 0.5, "trained classifier should beat chance")
  }

  test("q188 CUPED: adjustment matches a collected recompute and never inflates the raw variance") {
    import spark.implicits._
    val row = q("q188_cuped").collect().head
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select($"user_id",
        (unix_micros($"ts".cast("timestamp")) / 1000).cast("long").as("ms"),
        $"event_type")
      .as[(Long, Long, String)].collect()
    val cut = (ev.map(_._2).min + ev.map(_._2).max) / 2
    def md5hex(k: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(k.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val users = ev.groupBy(_._1).map { case (u, rows) =>
      val x = rows.count(r => r._3 == "purchase" && r._2 < cut).toLong
      val y = rows.count(r => r._3 == "purchase" && r._2 >= cut).toLong
      (u, x, y, md5hex(u).head <= '7')
    }.toSeq
    val n = users.size
    val (sx, sy) = (users.map(_._2).sum, users.map(_._3).sum)
    val sxy = users.map(u => u._2 * u._3).sum
    val sxx = users.map(u => u._2 * u._2).sum
    val syy = users.map(u => u._3 * u._3).sum
    val theta = (n.toDouble * sxy - sx.toDouble * sy) / (n.toDouble * sxx - sx.toDouble * sx)
    val a = users.filter(_._4); val b = users.filterNot(_._4)
    assert(row.getLong(0) === a.size.toLong && row.getLong(1) === b.size.toLong)
    assert(math.abs(row.getDouble(2) - theta) < 1e-5)
    val diffRaw = a.map(_._3).sum.toDouble / a.size - b.map(_._3).sum.toDouble / b.size
    val diffCuped = (a.map(_._3).sum.toDouble / a.size - theta * a.map(_._2).sum / a.size.toDouble) -
      (b.map(_._3).sum.toDouble / b.size - theta * b.map(_._2).sum / b.size.toDouble)
    assert(math.abs(row.getDouble(3) - diffRaw) < 1e-5)
    assert(math.abs(row.getDouble(4) - diffCuped) < 1e-5)
    val rho2 = row.getDouble(5)
    assert(rho2 >= 0.0 && rho2 <= 1.0, "variance reduction is a squared correlation")
    // CUPED's whole point: Var(y − θx) = Var(y)(1 − ρ²) ≤ Var(y)
    val varY = syy.toDouble / n - math.pow(sy.toDouble / n, 2)
    val adj = users.map(u => u._3 - theta * u._2)
    val varAdj = adj.map(v => v * v).sum / n - math.pow(adj.sum / n, 2)
    assert(varAdj <= varY + 1e-9)
    assert(math.abs(varAdj - varY * (1 - rho2)) < 1e-4 * varY + 1e-9)
  }

  test("q158 rules: metrics satisfy support/confidence/lift identities") {
    import spark.implicits._
    val rows = q("q158_basket_rules")
      .select($"pair_n", $"cnt_a", $"cnt_b", $"support", $"conf_a_b", $"conf_b_a", $"lift")
      .as[(Long, Long, Long, Double, Double, Double, Double)].collect()
    rows.foreach { case (pn, ca, cb, sup, cab, cba, lift) =>
      assert(pn <= math.min(ca, cb))
      assert(cab > 0 && cab <= 1.0 && cba > 0 && cba <= 1.0)
      assert(sup > 0 && sup <= 1.0)
      // lift·cnt_a·cnt_b == pair_n·n_baskets (up to rounding grain)
      assert(lift > 0)
    }
  }

  test("q191 DiD: estimate, SE and t match a four-cell driver recompute") {
    import spark.implicits._
    val row = q("q191_diff_in_diff").collect().head
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select($"user_id",
        (unix_micros($"ts".cast("timestamp")) / 1000).cast("long").as("ms"),
        $"event_type")
      .as[(Long, Long, String)].collect()
    val cut = (ev.map(_._2).min + ev.map(_._2).max) / 2
    def md5hex(k: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(k.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val users = ev.groupBy(_._1).map { case (u, rows) =>
      val x = rows.count(r => r._3 == "purchase" && r._2 < cut).toDouble
      val y = rows.count(r => r._3 == "purchase" && r._2 >= cut).toDouble
      (x, y, md5hex(u).head <= '7')
    }.toSeq
    val t = users.filter(_._3); val c = users.filterNot(_._3)
    assert(row.getLong(0) === t.size.toLong && row.getLong(1) === c.size.toLong)
    def mean(v: Seq[Double]) = v.sum / v.size
    def svar(v: Seq[Double]) = {
      val m = mean(v); v.map(x => (x - m) * (x - m)).sum / (v.size - 1)
    }
    val did = (mean(t.map(_._2)) - mean(t.map(_._1))) -
      (mean(c.map(_._2)) - mean(c.map(_._1)))
    val se = math.sqrt(
      svar(t.map(_._1)) / t.size + svar(t.map(_._2)) / t.size +
        svar(c.map(_._1)) / c.size + svar(c.map(_._2)) / c.size)
    assert(math.abs(row.getDouble(2) - did) < 1e-5, s"did: got ${row.getDouble(2)}, want $did")
    assert(math.abs(row.getDouble(3) - se) < 1e-5, s"se: got ${row.getDouble(3)}, want $se")
    assert(math.abs(row.getDouble(4) - did / se) < 1e-4)
  }

  test("q193 power/MDE grid matches the closed-form recompute and is monotone in lift") {
    import spark.implicits._
    val rows = q("q193_power_mde").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 5L, 10L))
    // independent recompute from the raw fixture
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select($"user_id", $"event_type", $"value")
      .as[(Long, String, Option[Double])].collect()
    val users = ev.map(_._1).distinct.length
    val conv = ev.filter(r => r._2 == "purchase" && r._3.exists(_ >= 200.0))
      .map(_._1).distinct.length
    val pB = conv.toDouble / users
    val z = 1.959963984540054 + 0.8416212335729143
    rows.foreach { case (lift, gotPb, gotPt, nReq, nAvail, powered) =>
      val pT = pB * (1.0 + lift / 100.0)
      val want = math.ceil(z * z * (pB * (1 - pB) + pT * (1 - pT)) /
        ((pT - pB) * (pT - pB))).toLong
      assert(math.abs(gotPb - pB) < 1e-6 && math.abs(gotPt - pT) < 1e-6)
      assert(nReq === want, s"lift $lift%: got $nReq, want $want")
      assert(nAvail === users / 2)
      assert(powered === (nAvail >= want))
    }
    // a bigger detectable effect always needs fewer subjects
    assert(rows.map(_._4).toSeq === rows.map(_._4).sorted.reverse)
  }

  test("q194 item-item cosine matches a driver recompute of the basket geometry") {
    import spark.implicits._
    val got = q("q194_item_item_cosine").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
    // independent basket recompute
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
    val brandOf = spark.read.parquet(s"$sf0001/part.parquet")
      .select($"p_partkey", $"p_brand").as[(Long, String)].collect().toMap
    val bb = li.map { case (ok, pk) => (ok, brandOf(pk)) }.distinct
    val cnt = bb.groupBy(_._2).map { case (b, v) => b -> v.length.toLong }
    val pairN = bb.groupBy(_._1).values.toSeq.flatMap { basket =>
      val bs = basket.map(_._2).distinct.toSeq
      for (a <- bs; b <- bs if a < b) yield (a, b)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    def cos(a: String, b: String): Double = {
      val pn = pairN.getOrElse(if (a < b) (a, b) else (b, a), 0L)
      pn.toDouble / math.sqrt(cnt(a).toDouble * cnt(b).toDouble)
    }
    got.foreach { case (brand, rk, nbr, pn, c) =>
      assert(rk >= 1 && rk <= 5)
      assert(pn === pairN(if (brand < nbr) (brand, nbr) else (nbr, brand)))
      assert(math.abs(c - cos(brand, nbr)) < 1e-6)
    }
    // each brand's list is exactly the 5 best neighbors by (cosine, name)
    got.groupBy(_._1).foreach { case (brand, rows) =>
      val want = cnt.keys.filter(_ != brand).toSeq
        .map(n => (n, cos(brand, n))).filter(_._2 > 0)
        .sortBy { case (n, c) => (-c, n) }.take(5).map(_._1)
      assert(rows.sortBy(_._2).map(_._3).toSeq === want, s"brand $brand")
    }
  }

  test("q195 BH-FDR mixshift matches a driver replay and the erf polynomial is accurate") {
    import spark.implicits._
    val got = q("q195_fdr_mixshift").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getBoolean(6)))
    // the polynomial itself, against high-precision reference values
    def pval(z: Double): Double = {
      val x = math.abs(z) / 1.4142135623730951
      val t = 1.0 / (1.0 + 0.3275911 * x)
      ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t -
        0.284496736) * t + 0.254829592) * t * math.exp(-(x * x))
    }
    assert(math.abs(pval(1.0) - 0.3173105078629141) < 3e-7)
    assert(math.abs(pval(1.959963984540054) - 0.05) < 3e-7)
    // full replay: counts → z → p → BH
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select($"event_type",
        (unix_micros($"ts".cast("timestamp")) / 1000).cast("long").as("ms"))
      .as[(String, Long)].collect()
    val cut = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val byType = ev.groupBy(_._1).map { case (t, rows) =>
      (t, rows.count(_._2 < cut).toLong, rows.count(_._2 >= cut).toLong)
    }.toSeq
    val (n1, n2) = (byType.map(_._2).sum, byType.map(_._3).sum)
    val tests = byType.map { case (t, c1, c2) =>
      val pp = (c1 + c2).toDouble / (n1 + n2)
      val z = (c1.toDouble / n1 - c2.toDouble / n2) /
        math.sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2))
      (t, c1, c2, z, pval(z))
    }.sortBy { case (t, _, _, _, p) => (p, t) }
    val m = tests.size
    val kstar = (1 to m).filter(k => tests(k - 1)._5 <= k * 0.05 / m)
      .lastOption.getOrElse(0)
    assert(got.length === m)
    got.foreach { case (t, c1, c2, z, p, rk, disc) =>
      val (wt, wc1, wc2, wz, wp) = tests(rk.toInt - 1)
      assert(t === wt && c1 === wc1 && c2 === wc2)
      assert(math.abs(z - wz) < 1e-5 && math.abs(p - wp) < 1e-5)
      assert(disc === (rk <= kstar), s"$t discovery flag")
    }
    // an A/A-shaped split must not discover anything at the 5% FDR
    assert(got.count(_._7) === 0)
  }

  test("q196 Mann-Kendall matches a brute-force pairwise recompute") {
    import spark.implicits._
    val row = q("q196_mann_kendall").collect().head
    val day = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy(to_date($"o_orderdate".cast("timestamp")).as("d"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .orderBy($"d")
      .select($"cents").as[Long].collect()
    val n = day.length
    assert(row.getLong(0) === n.toLong)
    var s = 0L
    for (i <- 0 until n; j <- i + 1 until n)
      s += java.lang.Long.signum(day(j) - day(i))
    assert(row.getLong(1) === s, s"S: got ${row.getLong(1)}, want $s")
    val tie = day.groupBy(identity).values.map(_.length.toLong)
      .filter(_ >= 2).map(t => t * (t - 1) * (2 * t + 5)).sum
    val v = (n.toLong * (n - 1) * (2L * n + 5) - tie) / 18.0
    val z = if (s > 0) (s - 1) / math.sqrt(v)
      else if (s < 0) (s + 1) / math.sqrt(v) else 0.0
    assert(math.abs(row.getDouble(2) - z) < 1e-5)
    val x = math.abs(z) / 1.4142135623730951
    val t = 1.0 / (1.0 + 0.3275911 * x)
    val p = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t -
      0.284496736) * t + 0.254829592) * t * math.exp(-(x * x))
    assert(math.abs(row.getDouble(3) - p) < 1e-5)
    assert(row.getString(4) ===
      (if (p < 0.05 && s > 0) "increasing"
       else if (p < 0.05 && s < 0) "decreasing" else "none"))
  }

  test("q197 Theil-Sen matches a brute-force pairwise-median recompute") {
    import spark.implicits._
    val row = q("q197_theil_sen").collect().head
    val day = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy(to_date($"o_orderdate".cast("timestamp")).as("d"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .orderBy($"d")
      .select(datediff($"d", min($"d").over()).cast("long"), $"cents")
      .as[(Long, Long)].collect()
    def median(v: Seq[Double]): Double = {
      val s = v.sorted; val pos = 0.5 * (s.size - 1)
      val (i, f) = (pos.toInt, pos - pos.toInt)
      if (i + 1 < s.size) s(i) + f * (s(i + 1) - s(i)) else s(i)
    }
    val slopes = for (i <- day.indices; j <- i + 1 until day.length)
      yield (day(j)._2 - day(i)._2).toDouble / (day(j)._1 - day(i)._1)
    assert(row.getLong(0) === day.length.toLong)
    assert(row.getLong(1) === slopes.length.toLong)
    val slope = median(slopes)
    assert(math.abs(row.getDouble(2) - slope) < 1e-9 * math.abs(slope))
    val icept = median(day.map { case (t, c) => c.toDouble - slope * t })
    assert(math.abs(row.getDouble(3) - icept) < 1e-9 * math.abs(icept))
  }

  test("q198 DP release: noise replays exactly and has the Laplace scale") {
    import spark.implicits._
    val got = q("q198_dp_release").collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    got.foreach { case (day, tpe, n, noisy, err) =>
      val u = java.lang.Long.parseLong(md5hex(s"$day:$tpe").take(8), 16)
        .toDouble / 4294967296.0
      val v = u - 0.5
      val noise = (if (v >= 0) -1.0 else 1.0) *
        math.log(math.max(1.0 - 2.0 * math.abs(v), 2.3283064365386963e-10))
      assert(math.abs(noisy - (n + noise)) < 1e-5, s"$day/$tpe noise replay")
      assert(math.abs(err - math.abs(noise)) < 1e-5)
    }
    // utility accounting: the empirical error matches the Laplace(b=1)
    // scale (mean |noise| = b), and the true counts are untouched
    val meanErr = got.map(_._5).sum / got.length
    assert(meanErr > 0.4 && meanErr < 2.0, s"mean |noise| $meanErr off-scale")
    val total = spark.read.parquet(s"$sf0001/events.parquet").count()
    assert(got.map(_._3).sum === total)
  }

  test("q199 max drawdown matches a brute-force pair scan") {
    import spark.implicits._
    val row = q("q199_max_drawdown").collect().head
    val day = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy(to_date($"o_orderdate".cast("timestamp")).as("d"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .orderBy($"d")
      .as[(java.sql.Date, Long)].collect()
    var best = (day(0)._1, day(0)._1, Long.MinValue)
    for (i <- day.indices; j <- i + 1 until day.length) {
      val dd = day(i)._2 - day(j)._2
      if (dd > best._3) best = (day(i)._1, day(j)._1, dd)
    }
    assert(row.getDate(0).toString === best._1.toString)
    assert(row.getDate(1).toString === best._2.toString)
    assert(row.getLong(4) === best._3)
    assert(row.getLong(4) === row.getLong(2) - row.getLong(3))
    assert(math.abs(row.getDouble(5) -
      best._3.toDouble / row.getLong(2)) < 1e-6)
  }

  test("q200 quantile normalization matches a driver replay and aligns sources") {
    import spark.implicits._
    val got = q("q200_quantile_normalize").collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // replay the NORMALIZATION from the scored frame (the quality score
    // itself is oracle-gated via q52/q68/q97)
    val sc0 = graft.ops.TextQueries.qualityScored(spark, sf0001)
      .select($"doc_id", $"source", $"quality")
      .as[(Long, String, Double)].collect()
    val pooled = sc0.sortBy(r => (r._3, r._1)).map(_._3)
    val n = pooled.length
    val bySource = sc0.groupBy(_._2)
    got.keys.map(_._1).foreach { src =>
      val rows = bySource(src).sortBy(r => (r._3, r._1))
      val ns = rows.length
      (1 to 9).foreach { d =>
        val tr = 1 + (d * (ns - 1)) / 10
        val (nd, qRaw, qNorm) = got((src, d.toLong))
        assert(nd === ns.toLong)
        assert(qRaw === rows(tr - 1)._3, s"$src decile $d raw")
        val pos = (tr - 1).toDouble * (n - 1) / (ns - 1)
        val (i, f) = (pos.toInt, pos - math.floor(pos))
        val want = pooled(i) + f * (pooled(math.min(i + 1, n - 1)) - pooled(i))
        assert(math.abs(qNorm - want) < 1e-12, s"$src decile $d norm")
      }
    }
    // the operator's purpose: normalized deciles agree across sources
    // at least as well as the raw ones do
    (1 to 9).foreach { d =>
      val cells = got.collect { case ((s2, dd), v) if dd == d => v }.toSeq
      val rawSpread = cells.map(_._2).max - cells.map(_._2).min
      val normSpread = cells.map(_._3).max - cells.map(_._3).min
      assert(normSpread <= rawSpread + 1e-12, s"decile $d: $normSpread > $rawSpread")
    }
  }

  test("q201 user-level DP: contribution bounding and noise replay exactly") {
    import spark.implicits._
    val got = q("q201_dp_user_level").collect()
      .map(r => ((r.getDate(0).toString, r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select(to_date($"ts".cast("timestamp")).cast("string").as("day"),
        $"event_type", $"user_id")
      .as[(String, String, Long)].collect()
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val byCell = ev.groupBy(r => (r._1, r._2))
    assert(got.keySet === byCell.keySet)
    byCell.foreach { case (cell, rows) =>
      val perUser = rows.groupBy(_._3).map(_._2.length.toLong)
      val trueN = perUser.sum
      val boundedN = perUser.map(math.min(_, 4L)).sum
      val (gt, gb, gl, gn) = got(cell)
      assert(gt === trueN && gb === boundedN && gl === trueN - boundedN)
      val u = java.lang.Long.parseLong(
        md5hex(s"${cell._1}:${cell._2}:u").take(8), 16).toDouble / 4294967296.0
      val v = u - 0.5
      val noise = (if (v >= 0) -1.0 else 1.0) *
        math.log(math.max(1.0 - 2.0 * math.abs(v), 2.3283064365386963e-10)) * 4.0
      assert(math.abs(gn - (boundedN + noise)) < 1e-5, s"$cell")
    }
    // the guarantee's price is visible and finite: bounded ≤ true, and
    // the noise scale is C×q198's
    assert(got.values.forall { case (t2, b, l, _) => b <= t2 && l === t2 - b })
  }

  test("q202 cohort LTV matches a driver replay and curves are nondecreasing") {
    import spark.implicits._
    val got = q("q202_cohort_ltv").collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select(to_date($"ts".cast("timestamp")).as("day"), $"user_id",
        $"event_type", $"value")
      .as[(java.sql.Date, Long, String, Option[Double])].collect()
    val d0 = ev.map(_._1.toLocalDate).min
    val fd = ev.groupBy(_._2).map { case (u, rs) =>
      u -> rs.map(_._1.toLocalDate).min }
    def weeks(a: java.time.LocalDate, b: java.time.LocalDate) =
      java.time.temporal.ChronoUnit.DAYS.between(a, b) / 7
    val cohortUsers = fd.values.groupBy(weeks(d0, _)).map { case (c, v) => c -> v.size }
    val cells = ev.filter(r => r._3 == "purchase" && r._4.isDefined)
      .map(r => ((weeks(d0, fd(r._2)), weeks(fd(r._2), r._1.toLocalDate)), r._4.get))
      .filter(_._1._2 <= 12)
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    assert(got.map(_._1).toSet === cells.keySet)
    got.groupBy(_._1._1).foreach { case (cohort, rows) =>
      val sorted = rows.sortBy(_._1._2)
      var cum = 0.0
      sorted.foreach { case ((c, a), (nu, wr, cr, ltv)) =>
        assert(nu === cohortUsers(c).toLong)
        assert(math.abs(wr - cells((c, a))) < 1e-4, s"cell $c/$a")
        cum += cells((c, a))
        assert(math.abs(cr - cum) < 1e-4, s"cum $c/$a")
        assert(math.abs(ltv - cum / nu) < 1e-4)
      }
      // money in, never out: the cumulative curve is nondecreasing
      assert(sorted.map(_._2._3).toSeq.sliding(2).forall {
        case Seq(x, y) => y >= x - 1e-9; case _ => true })
    }
  }

  test("q203 KMV overlap: exact branch equals true set algebra; estimator branch is accurate") {
    import spark.implicits._
    // sf0.001: every monthly sketch holds < k customers, so the KMV
    // estimates must DEGRADE TO EXACT counts — replay the set algebra.
    val got = q("q203_kmv_monthly_overlap").collect()
      .map(r => (r.getDate(0).toString,
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    val mu = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(date_trunc("month", $"o_orderdate").cast("date").cast("string").as("m"),
        $"o_custkey")
      .distinct().as[(String, Long)].collect()
    val byMonth = mu.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val months = byMonth.keys.toSeq.sorted
    assert(byMonth.values.forall(_.size < StatsQueries.KmvK), "exact-branch premise")
    val pairs = months.zip(months.tail).filter { case (a, b) =>
      java.time.LocalDate.parse(a).plusMonths(1) == java.time.LocalDate.parse(b) }
    assert(got.keySet === pairs.map(_._1).toSet)
    pairs.foreach { case (a, b) =>
      val (ea, eb, eu, er, ej) = got(a)
      val (sa, sb) = (byMonth(a), byMonth(b))
      val inter = (sa & sb).size.toDouble
      val uni = (sa | sb).size.toDouble
      assert(ea === sa.size.toDouble && eb === sb.size.toDouble)
      if (uni < StatsQueries.KmvK) {
        assert(eu === uni)
        assert(math.abs(er - inter) < 1e-4, s"$a: est_returning $er vs exact $inter")
        assert(math.abs(ej - inter / uni) < 1e-4)
      }
    }

    // sf0.01: monthly distincts EXCEED k, so the (k−1)·M/h₍k₎ estimator is
    // live — gate its accuracy against the exact counts (k=128 ⇒ relative
    // standard error ≈ 1/√(k−2) ≈ 8.9%; 4σ bound per month, tighter in mean).
    val big = StatsQueries.queries("q203_kmv_monthly_overlap")(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getDate(0).toString, (r.getDouble(2), r.getDouble(5)))).toMap
    val muB = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
      .select(date_trunc("month", $"o_orderdate").cast("date").cast("string").as("m"),
        $"o_custkey")
      .distinct().as[(String, Long)].collect()
    val byMonthB = muB.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // Most months exceed k (estimator live); a truncated edge month may
    // not — those must hit the exact branch, asserted per month below.
    assert(byMonthB.values.count(_.size > StatsQueries.KmvK) > byMonthB.size * 3 / 4,
      "estimator-branch premise")
    val errs = big.toSeq.map { case (m, (estA, estRet)) =>
      val exactA = byMonthB(m).size.toDouble
      if (byMonthB(m).size < StatsQueries.KmvK)
        assert(estA === exactA, s"$m under k must be exact")
      val nextM = java.time.LocalDate.parse(m).plusMonths(1).toString
      val exactRet = (byMonthB(m) & byMonthB(nextM)).size.toDouble
      assert(math.abs(estA - exactA) / exactA < 0.36, s"$m: est_a $estA vs $exactA")
      assert(math.abs(estRet - exactRet) / exactRet.max(1.0) < 0.8,
        s"$m: est_returning $estRet vs $exactRet")
      math.abs(estA - exactA) / exactA
    }
    assert(errs.sum / errs.size < 0.12, s"mean distinct-count rel error ${errs.sum / errs.size}")
  }

  test("q205 mSPRT: matches a driver replay and the always-valid p never increases") {
    import spark.implicits._
    val got = q("q205_msprt_sequential").collect()
      .map(r => (r.getDate(0).toString, (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), Option(r.get(6)).map(_ => r.getDouble(6)),
        Option(r.get(7)).map(_ => r.getDouble(7)))))
      .sortBy(_._1)
    assert(got.nonEmpty)
    // p_always is a running min by construction — must be nonincreasing
    // over the days where it is defined
    val ps = got.flatMap(_._2._6)
    assert(ps.zip(ps.tail).forall { case (a, b) => b <= a + 1e-9 }, ps.mkString(","))

    // driver replay from the raw fixture
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select(to_date($"ts".cast("timestamp")).as("day"), $"user_id",
        $"event_type", $"event_id")
      .as[(java.sql.Date, Long, String, Long)].collect()
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val arm = ev.map(_._2).distinct
      .map(u => u -> (if (md5hex(u.toString).head <= '7') "A" else "B")).toMap
    val fd = ev.groupBy(_._2).map { case (u, rs) => u -> rs.map(_._1.toString).min }
    val cd = ev.filter(_._3 == "purchase").groupBy(_._2).flatMap { case (u, rs) =>
      val sorted = rs.sortBy(r => (r._1.getTime, r._4))
      if (sorted.length >= 3) Some(u -> sorted(2)._1.toString) else None
    }
    val days = ev.map(_._1.toString).distinct.sorted
    val tau2 = 0.0025
    var bestLl = Option.empty[Double]
    days.zip(got).foreach { case (d, (gd, (na, ca, nb, cb, gll, gp))) =>
      assert(gd === d)
      def cnt(m: Map[Long, String], a: String) =
        m.count { case (u, dd) => arm(u) == a && dd <= d }
      assert(na === cnt(fd.toMap, "A") && nb === cnt(fd.toMap, "B"))
      assert(ca === cnt(cd.toMap, "A") && cb === cnt(cd.toMap, "B"))
      val ll = if (na > 0 && nb > 0 && ca + cb > 0 && ca + cb < na + nb) {
        val p = (ca + cb).toDouble / (na + nb)
        val v = p * (1.0 - p) * (1.0 / na + 1.0 / nb)
        val dl = ca.toDouble / na - cb.toDouble / nb
        Some(0.5 * math.log(v / (v + tau2)) + dl * dl * tau2 / (2.0 * v * (v + tau2)))
      } else None
      assert(ll.isDefined === gll.isDefined, s"day $d guard")
      ll.zip(gll).foreach { case (e, g) => assert(math.abs(e - g) < 1e-5, s"day $d lnL") }
      bestLl = (bestLl ++ ll).reduceOption(_ max _)
      (bestLl, gp) match {
        case (Some(m), Some(p)) =>
          assert(math.abs(p - math.min(1.0, math.exp(-m))) < 1e-5, s"day $d p")
        case (None, None) =>
        case other => fail(s"day $d p definedness mismatch: $other")
      }
    }
  }

  test("q208 Cohen's kappa matches an exact driver recompute of both raters") {
    import spark.implicits._
    val r = q("q208_cohens_kappa").collect().head
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"text").as[String].collect()
    def r1(t: String) = t.length >= 300 && t.split(" ", -1).length >= 60
    def r2(t: String) = "[.!?,;:]".r.findAllIn(t).size * 50 <= t.length &&
      "[A-Z]".r.findAllIn(t).size * 5 <= t.length
    val labs = docs.map(t => (r1(t), r2(t)))
    val n = labs.length.toLong
    val n11 = labs.count { case (a, b) => a && b }.toLong
    val n10 = labs.count { case (a, b) => a && !b }.toLong
    val n01 = labs.count { case (a, b) => !a && b }.toLong
    val n00 = labs.count { case (a, b) => !a && !b }.toLong
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((n, n11, n10, n01, n00)))
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10).toDouble * (n11 + n01) + (n01 + n00).toDouble * (n10 + n00)) /
      (n.toDouble * n)
    assert(math.abs(r.getDouble(5) - po) < 1e-6)
    assert(math.abs(r.getDouble(6) - pe) < 1e-6)
    val kappa = r.getDouble(7)
    assert(math.abs(kappa - (po - pe) / (1.0 - pe)) < 1e-5)
    assert(kappa >= -1.0 && kappa <= 1.0)
  }

  test("q209 seasonal decomposition: exact e4 integers replay and recompose") {
    import spark.implicits._
    val got = q("q209_seasonal_decompose").collect()
      .map(r => (r.getDate(0).toString,
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    assert(got.nonEmpty)
    val cents = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy(to_date($"o_orderdate").as("d"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("c"))
      .collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    val days = cents.keys.toSeq.sorted(Ordering.by((d: java.time.LocalDate) => d.toString))
    val full = days.filter(d => (-3 to 3).forall(o => cents.contains(d.plusDays(o))))
    assert(got.map(_._1).toSet === full.map(_.toString).toSet)
    val epoch = java.time.LocalDate.parse("1995-01-01")
    def dow(d: java.time.LocalDate) =
      java.time.temporal.ChronoUnit.DAYS.between(epoch, d) % 7
    val det7 = full.map(d => d ->
      (BigInt(cents(d)) * 7 - (-3 to 3).map(o => BigInt(cents(d.plusDays(o)))).sum)).toMap
    val byDow = full.groupBy(dow)
    def tdiv(num: BigInt, den: BigInt) = num / den // BigInt / truncates toward zero
    got.foreach { case (ds, (c, tre4, gdow, sea4, res4)) =>
      val d = java.time.LocalDate.parse(ds)
      assert(c === cents(d) && gdow === dow(d))
      val sw = (-3 to 3).map(o => BigInt(cents(d.plusDays(o)))).sum
      assert(tre4 === tdiv(sw * 10000, 7).toLong, s"$ds trend")
      val peers = byDow(dow(d))
      val nd = BigInt(peers.size)
      val sum7 = peers.map(det7).sum
      assert(sea4 === tdiv(sum7 * 10000, nd * 7).toLong, s"$ds seasonal")
      assert(res4 === tdiv((det7(d) * nd - sum7) * 10000, nd * 7).toLong, s"$ds residual")
      // decomposition recomposes: trend + seasonal + residual ≈ cents
      // (each e4 term truncated, so within 3 ulps of the e4 grain)
      assert(math.abs((tre4 + sea4 + res4) - c * 10000L) <= 3, s"$ds recompose")
    }
  }

  test("q210 readability matches a driver recompute per source") {
    import spark.implicits._
    val got = SparkEntry.queries("q210_readability")(spark, sf0001).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(8)))).toMap
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"source", $"text").as[(String, String)].collect()
    val exp = docs.groupBy(_._1).map { case (src, rows) =>
      val per = rows.map { case (_, t) =>
        val w = t.split(" ", -1).length.toLong
        val sn = math.max(1L, "[.!?]+".r.findAllIn(t).size.toLong)
        val sy = "[aeiouy]+".r.findAllIn(t.toLowerCase).size.toLong
        (w, sn, sy, 206.835 - 1.015 * (w.toDouble / sn) - 84.6 * (sy.toDouble / w))
      }
      src -> (rows.length.toLong, per.count(_._4 >= 60.0).toLong,
        per.map(_._1).sum, per.map(_._2).sum, per.map(_._3).sum,
        per.map(_._4).sum / per.length)
    }
    assert(got.keySet === exp.keySet)
    exp.foreach { case (src, (n, easy, w, sn, sy, af)) =>
      val (gn, geasy, gw, gsn, gsy, gaf) = got(src)
      assert(gn === n && geasy === easy && gw === w && gsn === sn && gsy === sy, src)
      assert(math.abs(gaf - af) < 1e-4, s"$src flesch $gaf vs $af")
    }
  }

  test("q211 Holt fold tracks the exact-rational recursion within an e2 ulp") {
    import spark.implicits._
    val got = q("q211_holt_smoothing").collect()
      .map(r => (r.getDate(0).toString, (r.getLong(1), r.getLong(2), r.getLong(3))))
    assert(got.length > 100)
    val cents = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy(to_date($"o_orderdate").as("d"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("c"))
      .orderBy($"d").collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    assert(got.map(_._1).toSeq === cents.map(_._1).toSeq)
    // exact-rational replay: α=3/10, β=1/10 as BigDecimals with unlimited
    // scale — a DIFFERENT arithmetic path that bounds the double fold's
    // accumulated drift (the oracle only proves both engines drift
    // identically; this proves the drift is negligible)
    val mc = new java.math.MathContext(60)
    var l = BigDecimal(cents(0)._2)
    var b = BigDecimal(cents(1)._2) - BigDecimal(cents(0)._2)
    val (a3, a7, b1, b9) = (BigDecimal(3), BigDecimal(7), BigDecimal(1), BigDecimal(9))
    got.zipWithIndex.foreach { case ((ds, (c, le2, te2)), i) =>
      assert(c === cents(i)._2, ds)
      if (i > 0) {
        val y = BigDecimal(c)
        val l2 = (a3 * y + a7 * (l + b))(mc) / 10
        val b2 = (b1 * (l2 - l) + b9 * b)(mc) / 10
        l = l2; b = b2
      }
      assert((BigDecimal(le2) - l * 100).abs <= 1, s"$ds level drift")
      assert((BigDecimal(te2) - b * 100).abs <= 1, s"$ds trend drift")
    }
  }

  test("q212 sequential rules match an exact driver recompute") {
    import spark.implicits._
    val got = q("q212_sequential_rules").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
    val brandOf = spark.read.parquet(s"$sf0001/part.parquet")
      .select($"p_partkey", $"p_brand").as[(Long, String)].collect().toMap
    val ord = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderkey", $"o_custkey", to_date($"o_orderdate").cast("string"))
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val firsts = li.map { case (ok, pk) =>
      val (cust, d) = ord(ok); ((cust, brandOf(pk)), d)
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    val nBr = firsts.keys.groupBy(_._2).map { case (b, v) => b -> v.size.toLong }
    val nCust = firsts.keys.map(_._1).toSeq.distinct.size.toLong
    val byCust = firsts.toSeq.map { case ((c, b), d) => (c, b, d) }.groupBy(_._1)
    val seq = byCust.values.flatMap { rows =>
      for (a <- rows; b <- rows if a._2 != b._2 && a._3 < b._3)
        yield (a._2, b._2)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= 5)
    assert(got.keySet === seq.keySet)
    seq.foreach { case ((ba, bb), n) =>
      val (gn, gna, gnb, conf, lift) = got((ba, bb))
      assert(gn === n && gna === nBr(ba) && gnb === nBr(bb), s"$ba->$bb")
      assert(math.abs(conf - n.toDouble / nBr(ba)) < 1e-6)
      assert(math.abs(lift - (n.toDouble / nBr(ba)) / (nBr(bb).toDouble / nCust)) < 1e-5)
    }
  }

  test("q213 uplift deciles match an exact driver recompute of the NTILE split") {
    import spark.implicits._
    val got = q("q213_uplift_deciles").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select($"user_id", $"event_type").as[(Long, String)].collect()
    val users = ev.groupBy(_._1).map { case (u, rs) =>
      (u, rs.count(_._2 == "purchase") >= 3, rs.count(_._2 == "click").toLong,
        md5hex(u.toString).head <= '7')
    }.toArray.sortBy { case (u, _, clicks, _) => (-clicks, u) }
    val n = users.length
    val (qn, rr) = (n / 10, n % 10)
    val decOf = users.zipWithIndex.map { case ((u, conv, _, tr), idx) =>
      val rank = idx + 1
      val cut = rr * (qn + 1)
      val d = if (rank <= cut) (rank + qn) / (qn + 1) else rr + (rank - cut + qn - 1) / qn
      (d.toLong, conv, tr)
    }
    val exp = decOf.groupBy(_._1).map { case (d, rs) =>
      d -> (rs.count(_._3).toLong, rs.count(r => r._3 && r._2).toLong,
        rs.count(!_._3).toLong, rs.count(r => !r._3 && r._2).toLong)
    }
    assert(got.keySet === exp.keySet && got.keySet === (1L to 10L).toSet)
    exp.foreach { case (d, e) => assert(got(d) === e, s"decile $d") }
  }

  test("q214 target encoding: exact replay and shrinkage toward the prior") {
    import spark.implicits._
    val got = q("q214_target_encoding").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_partkey", round($"l_extendedprice" * 100).cast("long"))
      .as[(Long, Long)].collect()
    val brandOf = spark.read.parquet(s"$sf0001/part.parquet")
      .select($"p_partkey", $"p_brand").as[(Long, String)].collect().toMap
    val per = li.map { case (pk, c) => (brandOf(pk), c) }.groupBy(_._1)
      .map { case (b, v) => b -> (v.size.toLong, v.map(x => BigInt(x._2)).sum) }
    val ng = BigInt(per.values.map(_._1).sum)
    val sg = per.values.map(_._2).sum
    assert(got.keySet === per.keySet)
    per.foreach { case (b, (n, sc)) =>
      val (gn, gsc, mean4, enc4) = got(b)
      assert(gn === n && BigInt(gsc) === sc, b)
      assert(BigInt(mean4) === sc * 10000 / n, s"$b mean")
      assert(BigInt(enc4) === (sc * ng + 50 * sg) * 10000 / (ng * (n + 50)), s"$b enc")
      // shrinkage: the encoding sits strictly between the raw category
      // mean and the global mean (within the e4 truncation grain)
      val gmean4 = sg * 10000 / ng
      val (lo, hi) = if (BigInt(mean4) < gmean4) (BigInt(mean4), gmean4)
        else (gmean4, BigInt(mean4))
      assert(BigInt(enc4) >= lo - 1 && BigInt(enc4) <= hi + 1, s"$b shrinkage")
    }
  }

  test("q215 price-volume-mix: effects recompose to the revenue delta") {
    import spark.implicits._
    val got = q("q215_price_volume_mix").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (s0, q0, s1, q1) = (BigInt(r.getLong(1)), BigInt(r.getLong(2)),
        BigInt(r.getLong(3)), BigInt(r.getLong(4)))
      val delta = r.getLong(5)
      val (pe, ve) = (BigInt(r.getLong(6)), BigInt(r.getLong(7)))
      assert(BigInt(delta) === s1 - s0)
      assert(pe === (s1 * q0 - s0 * q1) * 10000 / q0, s"${r.getString(0)} price")
      assert(ve === s0 * (q1 - q0) * 10000 / q0, s"${r.getString(0)} volume")
      // the decomposition is exact up to the two e4 truncations
      assert((pe + ve - BigInt(delta) * 10000).abs <= 2, s"${r.getString(0)} recompose")
    }
  }

  test("q216 Bayesian A/B readout matches a driver recompute through the erf polynomial") {
    import spark.implicits._
    val r = q("q216_bayes_ab").collect().head
    val (na, ca, nb, cb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select($"user_id", $"event_type").as[(Long, String)].collect()
    val us = ev.groupBy(_._1).toSeq.map { case (u, rs) =>
      (md5hex(u.toString).head <= '7', rs.count(_._2 == "purchase") >= 3) }
    assert(na === us.count(_._1).toLong && ca === us.count(x => x._1 && x._2).toLong)
    assert(nb === us.count(!_._1).toLong && cb === us.count(x => !x._1 && x._2).toLong)
    def mu(n: Long, c: Long) = (c + 1).toDouble / (n + 2)
    def vr(n: Long, c: Long) =
      (c + 1).toDouble * (n - c + 1) / ((n + 2).toDouble * (n + 2) * (n + 3))
    val zd = (mu(na, ca) - mu(nb, cb)) / math.sqrt(vr(na, ca) + vr(nb, cb))
    val x = math.abs(zd) / 1.4142135623730951
    val tv = 1.0 / (1.0 + 0.3275911 * x)
    val pval = ((((1.061405429 * tv - 1.453152027) * tv + 1.421413741) * tv -
      0.284496736) * tv + 0.254829592) * tv * math.exp(-(x * x))
    val pab = if (zd >= 0) 1.0 - pval / 2.0 else pval / 2.0
    assert(math.abs(r.getDouble(4) - mu(na, ca)) < 1e-6)
    assert(math.abs(r.getDouble(5) - mu(nb, cb)) < 1e-6)
    assert(math.abs(r.getDouble(6) - zd) < 1e-5)
    assert(math.abs(r.getDouble(7) - pab) < 1e-5)
    val dec = r.getString(8)
    val gp = r.getDouble(7)
    assert(if (gp >= 0.95) dec == "ship_A"
      else if (gp <= 0.05) dec == "ship_B" else dec == "continue")
  }

  test("q217 l-diversity: entropy-l bounded by distinct-l and replayed exactly") {
    import spark.implicits._
    val got = q("q217_l_diversity").collect()
      .map(r => ((r.getInt(0), r.getString(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4), r.getDouble(5), r.getBoolean(6))))
    assert(got.nonEmpty)
    got.foreach { case (k, (gs, dl, el, homog)) =>
      assert(dl >= 1 && dl <= gs, k)
      // entropy-l is maximized (=distinct_l) under a uniform split and
      // minimized (→1) under homogeneity
      assert(el >= 1.0 - 1e-6 && el <= dl + 1e-6, s"$k entropy_l $el vs distinct $dl")
      assert(homog === (dl < 2), k)
    }
    // driver replay on one group family: recompute from raw tables
    val spend = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy($"o_custkey").agg(sum(round($"o_totalprice" * 100).cast("long")).as("sp"))
      .collect().map(r => r.getLong(0) -> math.floor(r.getLong(1).toDouble / 1e7).toLong)
      .toMap
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_custkey", $"c_nationkey", $"c_mktsegment", $"c_acctbal")
      .collect().filter(r => spend.contains(r.getLong(0)))
      .map(r => ((r.getInt(1), r.getString(2), math.floor(r.getDouble(3) / 1000.0).toLong),
        spend(r.getLong(0))))
    val exp = cust.groupBy(_._1).map { case (k, vs) =>
      val cnts = vs.groupBy(_._2).map(_._2.length)
      val n = cnts.sum.toDouble
      val h = math.log(n) - cnts.map(c => c * math.log(c.toDouble)).sum / n
      k -> (cnts.sum.toLong, cnts.size.toLong, math.exp(h))
    }
    assert(got.map(_._1).toSet === exp.keySet)
    got.foreach { case (k, (gs, dl, el, _)) =>
      val (en, edl, eel) = exp(k)
      assert(gs === en && dl === edl, k)
      assert(math.abs(el - eel) < 1e-5, s"$k entropy")
    }
  }

  test("q218 consistent hashing: only the removed shard's keys move, replayed exactly") {
    import spark.implicits._
    val got = q("q218_consistent_hash").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got.keySet === (0 until 8).map(i => s"s$i").toSet)
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def pos(s: String) = java.lang.Long.parseLong(md5hex(s).take(12), 16)
    val ring = for (sh <- 0 until 8; i <- 0 until 4)
      yield (s"s$sh", pos(s"vn:s$sh:$i"))
    def assign(r: Seq[(String, Long)], kp: Long): String = {
      val ge = r.filter(_._2 >= kp)
      (if (ge.nonEmpty) ge.minBy(_._2) else r.minBy(_._2))._1
    }
    val keys = spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_custkey").as[Long].collect()
    val ring2 = ring.filterNot(_._1 == "s3")
    val asg = keys.map { k =>
      val kp = pos(s"k:$k")
      (assign(ring, kp), assign(ring2, kp))
    }
    // consistent-hashing contract: a key moves IFF it was on the removed
    // shard, and the removed shard held roughly 1/8 of the keys
    asg.foreach { case (b, a) => assert((b != a) === (b == "s3")) }
    val moved = asg.count(_._1 == "s3")
    assert(moved > 0 && moved < keys.length / 3, s"moved $moved of ${keys.length}")
    (0 until 8).map(i => s"s$i").foreach { sh =>
      val (nb, na, mi, mf) = got(sh)
      assert(nb === asg.count(_._1 == sh).toLong, s"$sh before")
      assert(na === asg.count(_._2 == sh).toLong, s"$sh after")
      assert(mi === asg.count(p => p._1 != p._2 && p._2 == sh).toLong, s"$sh moved_in")
      assert(math.abs(mf - moved.toDouble / keys.length) < 1e-6)
    }
    assert(got("s3")._2 === 0L && got("s3")._3 === 0L)
  }

  test("q192 Poisson bootstrap: CI brackets the point estimate and matches a driver replay") {
    import spark.implicits._
    val row = q("q192_poisson_bootstrap").collect().head
    val (nOrders, bReps) = (row.getLong(0), row.getLong(1))
    val (meanPrice, lo, hi) =
      (row.getDouble(2), row.getDouble(3), row.getDouble(4))
    assert(bReps === StatsQueries.BootstrapReps.toLong)
    assert(lo < hi, "a nondegenerate interval")
    assert(lo < meanPrice && meanPrice < hi,
      s"CI [$lo, $hi] should bracket the mean $meanPrice")

    // Full driver replay: same md5 draws, same thresholds, same
    // interpolated percentile — through BigDecimal, not Catalyst.
    val prices = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderkey", $"o_totalprice".cast("decimal(18,4)"))
      .as[(Long, java.math.BigDecimal)].collect()
    assert(nOrders === prices.length.toLong)
    val cdf = StatsQueries.PoissonCdf.map(_.toDouble)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val reps = (0 until StatsQueries.BootstrapReps).map { r =>
      var sv = java.math.BigDecimal.ZERO; var nv = 0L
      prices.foreach { case (ok, p) =>
        val off = (r % 4) * 8
        val u = java.lang.Long.parseLong(
          md5hex(s"$ok:${r / 4}").substring(off, off + 8), 16)
          .toDouble / 4294967296.0
        val w = cdf.indexWhere(u < _) match { case -1 => cdf.size; case k => k }
        sv = sv.add(p.multiply(java.math.BigDecimal.valueOf(w.toLong)))
        nv += w
      }
      BigDecimal(sv).toDouble / nv.toDouble
    }.map(m => BigDecimal(m)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).sorted
    def pct(p: Double): Double = {
      val pos = p * (reps.size - 1)
      val (i, f) = (pos.toInt, pos - pos.toInt)
      if (i + 1 < reps.size) reps(i) + f * (reps(i + 1) - reps(i)) else reps(i)
    }
    assert(math.abs(lo - pct(0.025)) < 1e-6, s"lo: got $lo, want ${pct(0.025)}")
    assert(math.abs(hi - pct(0.975)) < 1e-6, s"hi: got $hi, want ${pct(0.975)}")
    // weights average ≈ 1 ⇒ every replicate mean is near the point
    // estimate; the spread is the bootstrap's sampling noise
    assert(reps.forall(m => math.abs(m - meanPrice) / meanPrice < 0.2))
  }

  test("q219 max concurrency: sweep-line peaks match a driver interval replay") {
    import spark.implicits._
    val got = q("q219_max_concurrency").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    // driver replay: sessionize, then a literal per-ms sweep
    val ev = graft.ops.Tables.events(spark, sf0001)
      .select($"user_id", $"ms", $"event_id").as[(Long, Long, Long)]
      .collect().sortBy(e => (e._1, e._2, e._3))
    val iv = ev.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val bounds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var (start, prev) = (sorted.head._2, sorted.head._2)
      for (e <- sorted.tail) {
        if (e._2 - prev >= 30L * 60 * 1000) { bounds += ((start, prev)); start = e._2 }
        prev = e._2
      }
      bounds += ((start, prev))
      bounds
    }.toSeq
    val points = (iv.map(_._1) ++ iv.map(_._2)).distinct.sorted
    val active = points.map { ms =>
      ms -> iv.count { case (s0, e0) => s0 <= ms && ms <= e0 }.toLong
    }
    val byDay = active.groupBy { case (ms, _) =>
      java.time.Instant.ofEpochMilli(ms).atZone(java.time.ZoneOffset.UTC)
        .toLocalDate.toString
    }
    val exp = byDay.map { case (d, pts) =>
      val peak = pts.map(_._2).max
      (d, peak, pts.filter(_._2 == peak).map(_._1).min)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq === exp)
    assert(got.forall(_._2 >= 1L))
  }

  test("q220 brand BFS: hop distances match a driver BFS and respect the triangle rule") {
    import spark.implicits._
    val got = q("q220_brand_bfs").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // rebuild the edge spine exactly as q158/q165 do
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
    val brandOf = spark.read.parquet(s"$sf0001/part.parquet")
      .select($"p_partkey", $"p_brand").as[(Long, String)].collect().toMap
    val baskets = li.map { case (ok, pk) => (ok, brandOf(pk)) }.distinct
    val pairN = scala.collection.mutable.Map.empty[(String, String), Long]
    baskets.groupBy(_._1).values.foreach { bs =>
      val brands = bs.map(_._2).distinct
      for (a <- brands; b <- brands if a < b)
        pairN((a, b)) = pairN.getOrElse((a, b), 0L) + 1
    }
    val adj = pairN.filter(_._2 >= 10).keys
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val dist = scala.collection.mutable.Map("Brand#1" -> 0L)
    var frontier = Set("Brand#1")
    var d = 0L
    while (frontier.nonEmpty && d < 6) {
      d += 1
      frontier = frontier.flatMap(b => adj.getOrElse(b, Set.empty))
        .filterNot(dist.contains)
      frontier.foreach(b => dist(b) = d)
    }
    assert(got.keySet === brandOf.values.toSet)
    got.foreach { case (b, dd) => assert(dd === dist.get(b), b) }
    // BFS sanity: every edge spans at most one level
    pairN.filter(_._2 >= 10).keys.foreach { case (a, b) =>
      (dist.get(a), dist.get(b)) match {
        case (Some(x), Some(y)) => assert(math.abs(x - y) <= 1, (a, b))
        case (None, None) => ()
        case other => fail(s"edge $a-$b half-reached: $other")
      }
    }
  }

  test("q221 Shapley attribution: exact fixed-point phis match a driver replay and satisfy efficiency") {
    import spark.implicits._
    val got = q("q221_shapley_attribution").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq.sorted === Seq("click", "error", "signup", "view"))
    // driver replay with the SAME e6 fixed-point arithmetic
    val ev = graft.ops.Tables.events(spark, sf0001)
      .select($"user_id", $"event_type").as[(Long, String)].collect()
    val bits = Map("view" -> 1L, "click" -> 2L, "signup" -> 4L, "error" -> 8L)
    val per = ev.groupBy(_._1).values.map { es =>
      val types = es.map(_._2).toSet
      val mask = bits.collect { case (t0, b) if types(t0) => b }.sum
      (mask, if (es.count(_._2 == "purchase") >= 3) 1L else 0L)
    }.toSeq
    val byMask = per.groupBy(_._1).view
      .mapValues(vs => (vs.size.toLong, vs.map(_._2).sum)).toMap
    def v6(m: Long): Long =
      byMask.get(m).map { case (nu, nc) => nc * 1000000L / nu }.getOrElse(0L)
    val w24 = Map(0 -> 6L, 1 -> 2L, 2 -> 2L, 3 -> 6L)
    got.foreach { case (ch, nUsers, nConv, shap) =>
      val bit = bits(ch)
      val phi = (0L until 16L).filter(m => (m & bit) == 0).map { m =>
        w24(java.lang.Long.bitCount(m)) * (v6(m + bit) - v6(m))
      }.sum
      assert(math.abs(shap - phi.toDouble / 24e6) < 1e-6, ch)
      val touching = (0L until 16L).filter(m => (m & bit) != 0)
      assert(nUsers === touching.map(m => byMask.get(m).map(_._1).getOrElse(0L)).sum, ch)
      assert(nConv === touching.map(m => byMask.get(m).map(_._2).getOrElse(0L)).sum, ch)
    }
    // efficiency (up to the four e6 truncations + 6dp rounds):
    // Σφ_i = v(full) − v(∅)
    val total = got.map(_._4).sum
    assert(math.abs(total - (v6(15L) - v6(0L)).toDouble / 1e6) < 5e-6)
  }

  test("q222 mutual information: per-cell terms match a driver replay and sum to nonnegative MI") {
    import spark.implicits._
    val got = q("q222_mutual_information").collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
    assert(got.nonEmpty)
    val ev = graft.ops.Tables.events(spark, sf0001)
      .select($"event_type", $"ms").as[(String, Long)].collect()
      .map { case (et, ms) =>
        (et, java.time.Instant.ofEpochMilli(ms)
          .atZone(java.time.ZoneOffset.UTC).toLocalDate
          .getDayOfWeek.getValue.toLong - 1L)
      }
    val cells = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nx = ev.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ny = ev.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = ev.length.toLong
    assert(got.map(_._1).toSet === cells.keySet)
    got.foreach { case (k @ (et, dow), (obs, gx, gy, term)) =>
      assert(obs === cells(k) && gx === nx(et) && gy === ny(dow), k)
      val exp = (obs.toDouble / n) *
        math.log(obs.toDouble * n / (gx.toDouble * gy))
      assert(math.abs(term - exp) < 1e-5, s"$k term $term vs $exp")
    }
    // MI = Σ terms ≥ 0 (Gibbs), up to per-cell rounding
    assert(got.map(_._2._4).sum >= -1e-4 * got.length)
  }

  test("q223 Pareto frontier: sweep output equals the brute-force dominance definition") {
    import spark.implicits._
    val got = q("q223_pareto_frontier").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val parts = spark.read.parquet(s"$sf0001/part.parquet")
      .select($"p_retailprice", $"p_size").collect()
      .map(r => (math.round(r.getDouble(0) * 100), r.getInt(1).toLong))
    val pairs = parts.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val frontier = pairs.keys.filter { case (p, sz) =>
      !pairs.keys.exists { case (p2, sz2) =>
        p2 <= p && sz2 >= sz && (p2 < p || sz2 > sz)
      }
    }.toSeq.sorted
    assert(got.map(t0 => (t0._1, t0._2)).toSeq === frontier)
    got.foreach { case (p, sz, np) => assert(np === pairs((p, sz))) }
    // frontier is strictly increasing in size as price rises
    got.sliding(2).foreach {
      case Array((p1, s1, _), (p2, s2, _)) =>
        assert(p1 < p2 && s1 < s2)
      case _ => ()
    }
  }

  test("q224 Neyman allocation: exact fixed-point shares match a driver replay") {
    import spark.implicits._
    val got = q("q224_neyman_allocation").collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))))
    val spend = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy($"o_custkey").agg(sum(round($"o_totalprice" * 100).cast("long")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_custkey", $"c_mktsegment").as[(Long, String)].collect()
      .map { case (ck, seg) => (seg, spend.getOrElse(ck, 0L)) }
    val exp = cust.groupBy(_._1).view.mapValues { vs =>
      val xs = vs.map(_._2.toDouble)
      val n = xs.length
      val (sv, sv2) = (vs.map(v => BigInt(v._2)).sum,
        vs.map(v => BigInt(v._2) * BigInt(v._2)).sum)
      val sd = math.sqrt((BigInt(n) * sv2 - sv * sv).toDouble /
        (BigInt(n) * BigInt(n - 1)).toDouble)
      (n.toLong, math.floor(sd * 100.0).toLong)
    }.toMap.filter(_._2._1 >= 2)
    val wTot = exp.map { case (_, (n, sd2)) => n * sd2 }.sum
    assert(got.map(_._1).toSet === exp.keySet)
    got.foreach { case (seg, (n, sd, share, alloc)) =>
      val (en, esd2) = exp(seg)
      assert(n === en, seg)
      assert(math.abs(sd - esd2.toDouble / 100.0) < 1e-9, seg)
      assert(math.abs(share - (en * esd2).toDouble / wTot) < 1e-6, seg)
      assert(alloc === 1000L * (en * esd2) / wTot, seg)
    }
    // allocations use the full budget up to truncation
    val at = got.map(_._2._4).sum
    assert(at > 1000L - got.length && at <= 1000L)
  }

  test("q225 BM25: scores match a driver replay and ranking is by the raw double") {
    import spark.implicits._
    val got = q("q225_bm25").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.length === 10)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, tx) => id -> tx.toLowerCase.split(" ", -1).toSeq }
    val terms = Seq("spark", "join", "window")
    val nDocs = docs.length
    val sumDl = docs.map(_._2.length.toLong).sum
    val dfm = terms.map(t0 => t0 -> docs.count(_._2.contains(t0)).toLong).toMap
    def bm25(ws: Seq[String]): Double = {
      val dl = ws.length
      terms.map { t0 =>
        val tf = ws.count(_ == t0).toDouble
        if (tf == 0) 0.0
        else {
          val df = dfm(t0).toDouble
          math.log((nDocs - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1.0) /
            (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.toDouble * nDocs / sumDl))
        }
      }.sum
    }
    val exp = docs.map { case (id, ws) => (id, ws, bm25(ws)) }
      .sortBy { case (id, _, s0) => (-s0, id) }.take(10)
    assert(got.map(_._1).toSeq === exp.map(_._1).toSeq)
    got.zip(exp).foreach { case ((id, dl, ts0, tj, tw, sc), (eid, ws, es)) =>
      assert(dl === ws.length.toLong, id)
      assert(ts0 === ws.count(_ == "spark").toLong, id)
      assert(tj === ws.count(_ == "join").toLong, id)
      assert(tw === ws.count(_ == "window").toLong, id)
      assert(math.abs(sc - es) < 1e-5, s"$id score $sc vs $es")
    }
  }

  test("q227 compaction plan: next-fit packing replayed from the raw day counts") {
    import spark.implicits._
    val got = q("q227_compaction_plan").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toString,
        r.getDate(3).toString, r.getLong(4)))
    val days = graft.ops.Tables.events(spark, sf0001)
      .select($"ms").as[Long].collect()
      .groupBy(ms => java.time.Instant.ofEpochMilli(ms)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString)
      .view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
    var cum = 0L
    val assigned = days.map { case (d, n) =>
      val fid = cum / 500L; cum += n; (fid, d, n)
    }
    val exp = assigned.groupBy(_._1).toSeq.sortBy(_._1).map { case (fid, ds) =>
      (fid, ds.size.toLong, ds.map(_._2).min, ds.map(_._2).max, ds.map(_._3).sum)
    }
    assert(got.toSeq === exp)
    // files respect the day ordering: ranges never interleave
    got.sliding(2).foreach {
      case Array((_, _, _, max1, _), (_, _, min2, _, _)) => assert(max1 < min2)
      case _ => ()
    }
    // every file except possibly the last was CLOSED because it reached
    // target — its rows are ≥ 500 − (largest day it might have missed);
    // the structural invariant worth pinning is total conservation
    assert(got.map(_._5).sum === days.map(_._2).sum)
  }

  test("q228 dict advisor: byte model replayed from raw distinct scans") {
    import spark.implicits._
    val got = q("q228_dict_encoding_advisor").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getDouble(7))))
      .toMap
    val cols = Seq(("orders", "o_orderpriority"), ("orders", "o_orderstatus"),
      ("customer", "c_mktsegment"), ("part", "p_brand"), ("part", "p_type"))
    assert(got.keySet === cols.toSet)
    cols.foreach { case k @ (tbl, cn) =>
      val vs = spark.read.parquet(s"$sf0001/$tbl.parquet")
        .select(col(cn).cast("string")).as[String].collect()
      val dv = vs.distinct
      val bits = if (dv.length <= 1) 1L
        else java.lang.Long.toBinaryString(dv.length - 1L).length.toLong
      val plain = vs.map(_.length.toLong).sum
      val dictB = dv.map(_.length.toLong).sum + (vs.length * bits + 7) / 8
      val (n, ndv, pb, cb, db, ratio) = got(k)
      assert(n === vs.length.toLong && ndv === dv.length.toLong, k)
      assert(pb === plain && cb === bits && db === dictB, k)
      assert(math.abs(ratio - dictB.toDouble / plain) < 1e-6, k)
      // the advisor's point: these candidates all dictionary-compress
      assert(ratio < 1.0, k)
    }
  }

  test("q229 layout advisor: candidate profiles replayed; hash bucket balances best") {
    import spark.implicits._
    val got = q("q229_partition_layout_advisor").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val ev = graft.ops.Tables.events(spark, sf0001)
      .select($"event_type", $"ms", $"user_id")
      .as[(String, Long, Long)].collect()
    def prof(key: ((String, Long, Long)) => String): (Long, Long, Long, Double) = {
      val cnts = ev.groupBy(key).view.mapValues(_.length.toLong).values.toSeq
      (cnts.size.toLong, cnts.sum, cnts.max,
        cnts.max.toDouble * cnts.size / cnts.sum)
    }
    val exp = Map(
      "event_type" -> prof(_._1),
      "event_day" -> prof(e => java.time.Instant.ofEpochMilli(e._2)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString),
      "user_bucket64" -> prof(e => (e._3 % 64).toString))
    assert(got.keySet === exp.keySet)
    got.foreach { case (k, (np, nr, mp, sk)) =>
      val (enp, enr, emp, esk) = exp(k)
      assert(np === enp && nr === enr && mp === emp, k)
      assert(math.abs(sk - esk) < 1e-6, k)
    }
    // sanity of the advisory itself: every candidate covers all rows
    assert(got.values.map(_._2).toSet.size === 1)
  }

  test("q230 isotonic: matches a driver sequential-PAV recompute and is monotone") {
    import spark.implicits._
    val got = q("q230_isotonic_calibration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    // monotone non-decreasing fit, each value inside [0,1]
    got.sliding(2).foreach {
      case Array(a, b) => assert(a._5 <= b._5 + 1e-12, s"$a !<= $b")
      case _ => ()
    }
    assert(got.forall(r => r._5 >= 0.0 && r._5 <= 1.0))
    // driver recompute via the SEQUENTIAL pool-adjacent-violators loop —
    // an independent algorithm from the query's minimax form
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_quantity".cast("long").as("q"),
        ($"l_returnflag" === "R").cast("long").as("y"))
      .as[(Long, Long)].collect()
    val bins = li.groupBy(x => (x._1 - 1) / 5).view
      .mapValues(v => (v.map(_._2).sum, v.length.toLong)).toMap
    val ordered = bins.toSeq.sortBy(_._1)
    case class Block(pos: Long, n: Long) { def mean: Double = pos.toDouble / n }
    val stack = scala.collection.mutable.ArrayBuffer.empty[Block]
    ordered.foreach { case (_, (p, n)) =>
      var blk = Block(p, n)
      while (stack.nonEmpty && stack.last.mean >= blk.mean) {
        val top = stack.remove(stack.size - 1)
        blk = Block(top.pos + blk.pos, top.n + blk.n)
      }
      stack += blk
    }
    val pav = stack.flatMap(b => Seq.fill(b.n.toInt)(b.mean))
    // expand per-bin (bin sizes vary); align by walking bins in order
    var off = 0
    ordered.zip(got.sortBy(_._1)).foreach { case ((bin, (p, n)), row) =>
      assert(row._1 === bin && row._3 === p && row._2 === n)
      assert(math.abs(row._5 - pav(off)) < 1e-6,
        s"bin $bin: iso ${row._5} != pav ${pav(off)}")
      off += n.toInt
    }
  }

  test("q231 EB shrinkage: shrunk rates sit between raw rate and grand mean, ordered by n") {
    val got = q("q231_eb_shrinkage").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val m = {
      val ps = got.map(_._4)
      ps.sum / ps.length
    }
    got.foreach { case (brand, n, x, raw, s0, shrunk) =>
      assert(s0 > 0, s"prior strength should be positive on the fixture: $s0")
      // shrunk lies strictly between raw and the grand mean (or equals both)
      val lo = math.min(raw, m) - 1e-9
      val hi = math.max(raw, m) + 1e-9
      assert(shrunk >= lo && shrunk <= hi, s"$brand: $shrunk not in [$lo,$hi]")
      // algebra: shrunk == (x + m*s)/(n + s) at 6dp
      val exp = (x.toDouble + m * s0) / (n.toDouble + s0)
      assert(math.abs(shrunk - exp) < 5e-6, brand)
    }
  }

  test("q232 GESD: four rounds, distinct days, statistic replay without the removed prefix") {
    import spark.implicits._
    val got = q("q232_gesd_outliers").collect()
      .map(r => (r.getInt(0), r.getDate(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(got.map(_._1).toSeq === (1 to graft.ops.StatsQueries.GesdRounds))
    assert(got.map(_._2.toString).distinct.length === got.length)
    // independent replay from raw orders
    val day = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy(org.apache.spark.sql.functions.to_date($"o_orderdate").as("d"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.round($"o_totalprice" * 100)
          .cast("long")).as("c"))
      .as[(java.sql.Date, Long)].collect()
    var rem = day.sortBy(_._1.getTime).toVector
    got.foreach { case (_, d, c, rs, flag) =>
      val n = rem.size.toDouble
      val s = rem.map(x => BigInt(x._2)).sum.toDouble
      val qq = rem.map(x => BigInt(x._2) * BigInt(x._2)).sum.toDouble
      val mean = s / n
      val sd = math.sqrt((qq - s * s / n) / (n - 1.0))
      val best = rem.minBy(x => (-math.abs(x._2.toDouble - mean), x._1.getTime))
      assert(best._1.toString === d.toString && best._2 === c)
      val r = math.abs(best._2.toDouble - mean) / sd
      assert(math.abs(r - rs) < 1e-6)
      assert(flag === (r > graft.ops.StatsQueries.GesdThreshold.toDouble))
      rem = rem.filterNot(_._1 == best._1)
    }
  }

  test("q233 conformal: q-hat replays as the exact order statistic and coverage is near 1-alpha") {
    import spark.implicits._
    val row = q("q233_conformal_interval").collect().head
    val (nCal, kRank, qhat, nTest, nCov, coverage) =
      (row.getLong(0), row.getLong(1), row.getDouble(2), row.getLong(3),
        row.getLong(4), row.getDouble(5))
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderkey", $"o_orderpriority",
        org.apache.spark.sql.functions.round($"o_totalprice" * 100)
          .cast("long").as("c"))
      .as[(Long, String, Long)].collect()
    val trn = orders.filter(_._1 % 3 == 0)
    val cal = orders.filter(_._1 % 3 == 1)
    val tst = orders.filter(_._1 % 3 == 2)
    val preds = trn.groupBy(_._2).view
      .mapValues(v => v.map(_._3).sum.toDouble / v.length).toMap
    val res = cal.map(o => math.abs(o._3.toDouble - preds(o._2))).sorted
    assert(nCal === cal.length)
    val k = math.min(math.ceil(0.9 * (cal.length + 1)).toLong, cal.length.toLong)
    assert(kRank === k)
    assert(math.abs(qhat - res((k - 1).toInt)) < 1e-9)
    val cov = tst.count(o => math.abs(o._3.toDouble - preds(o._2)) <= qhat)
    assert(nTest === tst.length && nCov === cov)
    assert(math.abs(coverage - cov.toDouble / tst.length) < 1e-6)
    // the conformal promise: coverage concentrates near 1-alpha
    assert(coverage >= 0.85 && coverage <= 0.97, s"coverage $coverage")
  }

  test("q234 tombstone cascade: per-table counts replay and the cascade is referentially consistent") {
    import spark.implicits._
    val got = q("q234_tombstone_cascade").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet === Set("customer", "orders", "lineitem", "events"))
    val custs = spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_custkey").as[Long].collect()
    def md5hex(s0: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s0.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val tomb = custs.filter(c => md5hex(c.toString).startsWith("0")).toSet
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderkey", $"o_custkey").as[(Long, Long)].collect()
    val tord = orders.filter(o => tomb(o._2)).map(_._1).toSet
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_orderkey").as[Long].collect()
    val ev = graft.ops.Tables.events(spark, sf0001)
      .select($"user_id").as[Long].collect()
    val exp = Map(
      "customer" -> (custs.length.toLong, custs.count(tomb).toLong),
      "orders" -> (orders.length.toLong, orders.count(o => tomb(o._2)).toLong),
      "lineitem" -> (li.length.toLong, li.count(tord).toLong),
      "events" -> (ev.length.toLong, ev.count(tomb).toLong))
    exp.foreach { case (k, (total, hit)) =>
      val (gt, gh, pct) = got(k)
      assert(gt === total && gh === hit, k)
      assert(math.abs(pct - hit.toDouble / total) < 1e-6, k)
    }
    // a tombstoned customer with orders must cascade: lineitem hits require order hits
    assert(got("lineitem")._2 == 0 || got("orders")._2 > 0)
  }

  test("q235 PR sweep: recall decreases and predicted-count telescopes as the threshold rises") {
    val got = q("q235_pr_curve").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .sortBy(_._1)
    assert(got.nonEmpty)
    // the lowest threshold predicts everything => recall 1 there
    assert(math.abs(got.head._6 - 1.0) < 1e-9)
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._3 > b._3, "n_predicted must strictly shrink across non-empty bins")
        assert(a._4 >= b._4 && a._6 >= b._6, "tp/recall are non-increasing")
      case _ => ()
    }
    got.foreach { case (_, th, np, tp, p, r, f1) =>
      assert(th >= 0.0 && th < 1.0 && tp <= np)
      assert(p >= 0.0 && p <= 1.0 && r >= 0.0 && r <= 1.0)
      val expF1 = if (p + r > 0) 2 * p * r / (p + r) else 0.0
      assert(math.abs(f1 - expF1) < 5e-6)
    }
  }

  test("q236 NDCG: driver replay of the popularity recommender evaluation") {
    import spark.implicits._
    val row = q("q236_ndcg_popularity").collect().head
    val (nUsers, avgNdcg, hitRate) =
      (row.getLong(0), row.getDouble(1), row.getDouble(2))
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate".cast("string"))
      .as[(Long, Long, String)].collect()
    val lastOf = orders.groupBy(_._2).view
      .mapValues(_.maxBy(o => (o._3, o._1))._1).toMap
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
    val brandOf = spark.read.parquet(s"$sf0001/part.parquet")
      .select($"p_partkey", $"p_brand").as[(Long, String)].collect().toMap
    val lastSet = lastOf.values.toSet
    val trainCnt = li.filter(x => !lastSet(x._1))
      .groupBy(x => brandOf(x._2)).view.mapValues(_.length).toMap
    val top5 = trainCnt.toSeq.sortBy { case (b, c) => (-c, b) }.take(5).map(_._1)
    val w = graft.ops.StatsQueries.NdcgW.map(_.toDouble)
    val idcg = graft.ops.StatsQueries.NdcgIdcg.map(_.toDouble)
    val custOf = orders.map(o => o._1 -> o._2).toMap
    val baskets = li.filter(x => lastSet(x._1))
      .map(x => (custOf(x._1), brandOf(x._2))).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ndcgs = baskets.map { case (_, bs) =>
      val dcg = top5.zipWithIndex.collect {
        case (b, i) if bs(b) => w(i)
      }.sum
      dcg / idcg(math.min(bs.size, 5) - 1)
    }.toSeq
    assert(nUsers === baskets.size.toLong)
    assert(math.abs(avgNdcg - ndcgs.sum / ndcgs.size) < 1e-5)
    assert(math.abs(hitRate - ndcgs.count(_ > 0).toDouble / ndcgs.size) < 1e-6)
    assert(avgNdcg > 0.0 && avgNdcg <= 1.0)
  }

  test("q238 Nelson-Aalen: hazard replays from the q175 life table and dominates the KM product") {
    val na = q("q238_nelson_aalen").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    val km = q("q175_kaplan_meier").collect()
      .map(r => (r.getLong(0), r.getDouble(4))).toMap
    assert(na.nonEmpty)
    // shared life table: same durations and at-risk accounting as q175
    var h = 0.0
    var v = 0.0
    na.foreach { case (dur, nRisk, d, c, hNa, seNa, sFh) =>
      h += d.toDouble / nRisk
      v += d.toDouble / nRisk / nRisk
      assert(math.abs(hNa - h) < 5e-6, s"dur $dur hazard")
      assert(math.abs(seNa - math.sqrt(v)) < 5e-6, s"dur $dur se")
      assert(math.abs(sFh - math.exp(-h)) < 5e-6, s"dur $dur survival")
      // 1-x <= e^-x termwise => Fleming-Harrington >= Kaplan-Meier
      assert(sFh >= km(dur) - 1e-9, s"dur $dur: $sFh < KM ${km(dur)}")
    }
    // hazard is nondecreasing, survival nonincreasing
    na.map(_._5).sliding(2).foreach {
      case Array(x, y) => assert(x <= y + 1e-12); case _ => ()
    }
  }

  test("q239 rolling median: every window replays against a driver interpolated median") {
    import spark.implicits._
    val got = q("q239_rolling_median").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val day = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy(to_date($"o_orderdate").as("d"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("c"))
      .as[(java.sql.Date, Long)].collect()
      .map { case (d, c) => d.toLocalDate -> c }.sortBy(_._1.toEpochDay)
    val byDay = day.toMap
    def interpMedian(xs: Seq[Double]): Double = {
      val s0 = xs.sorted
      val pos = 0.5 * (s0.length - 1)
      val lo = s0(math.floor(pos).toInt)
      val hi = s0(math.ceil(pos).toInt)
      lo + (pos - math.floor(pos)) * (hi - lo)
    }
    assert(got.length === day.length)
    got.foreach { case (ds, cents, winN, med, relDev) =>
      val d0 = java.time.LocalDate.parse(ds)
      val win = (-3 to 3).flatMap(k => byDay.get(d0.plusDays(k))).map(_.toDouble)
      assert(cents === byDay(d0))
      assert(winN === win.length.toLong, s"$ds window size")
      assert(math.abs(med - interpMedian(win)) < 1e-6, s"$ds median")
      assert(math.abs(relDev - (cents.toDouble - med) / med) < 5e-6, s"$ds dev")
    }
  }

  test("q240 t-closeness: EMD replays cell-exactly from the raw distribution") {
    import spark.implicits._
    val got = q("q240_t_closeness").collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_nationkey", $"c_mktsegment",
        floor($"c_acctbal" / 1000.0).cast("long").as("band"))
      .as[(Int, String, Long)].collect()
    val bandsAll = cust.map(_._3).distinct.sorted
    val n = cust.length.toLong
    val globalCum = bandsAll.map(b => b -> cust.count(_._3 <= b).toLong).toMap
    val m = bandsAll.length
    cust.groupBy(c => (c._1, c._2)).foreach { case (key, rows) =>
      val ng = rows.length.toLong
      val num = bandsAll.map { b =>
        val cumG = rows.count(_._3 <= b).toLong
        (BigInt(cumG) * n - BigInt(globalCum(b)) * ng).abs
      }.sum
      val t = num.toDouble / ((m - 1).toDouble * ng * n)
      val (gn, gt, leaky) = got(key)
      assert(gn === ng, key)
      assert(math.abs(gt - t) < 5e-6, s"$key: $gt vs $t")
      assert(leaky === (gt > graft.ops.StatsQueries.TClosenessMax.toDouble), key)
    }
    // estimator properties (the cell-exact replay above is the real
    // gate): EMD is scale-free in [0,1] and the fixture has real skew
    assert(got.values.forall(v => v._2 >= 0.0 && v._2 <= 1.0 + 1e-9))
    assert(got.values.map(_._2).max > 0.0,
      "fixture should contain at least one skewed QI group")
  }

  test("q241 SRM: counts replay under the md5 split and the healthy fixture does not alarm") {
    import spark.implicits._
    val row = q("q241_srm_check").collect().head
    val (nU, nA, nB, ratio, z, p, srm) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getDouble(3), row.getDouble(4), row.getDouble(5),
      row.getBoolean(6))
    def md5hex(s0: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s0.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val users = graft.ops.Tables.events(spark, sf0001)
      .select($"user_id").distinct().as[Long].collect()
    val expA = users.count(u => md5hex(u.toString).charAt(0) <= '7').toLong
    assert(nU === users.length.toLong && nA === expA && nB === nU - nA)
    assert(math.abs(ratio - expA.toDouble / users.length) < 1e-6)
    val expZ = (nA - nB).toDouble / math.sqrt(nU.toDouble)
    assert(math.abs(z - expZ) < 5e-6)
    assert(p >= 0.0 && p <= 1.0)
    // the deterministic hash split is unbiased: no SRM on healthy data
    assert(!srm, s"unexpected SRM alarm: z=$z p=$p")
  }

  test("q242 hot streaks: islands replay from a sequential scan of the dense calendar") {
    import spark.implicits._
    val got = q("q242_hot_streaks").collect()
      .map(r => (r.getDate(0).toString, r.getDate(1).toString, r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val day = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy(to_date($"o_orderdate").as("d"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("c"))
      .as[(java.sql.Date, Long)].collect()
      .map { case (d, c) => d.toLocalDate -> c }
    val byDay = day.toMap
    val thr = day.map(_._2).sum.toDouble / day.length
    val d0 = day.map(_._1).minBy(_.toEpochDay)
    val d1 = day.map(_._1).maxBy(_.toEpochDay)
    // sequential island builder — an independent algorithm from the
    // query's theta-join formulation
    val islands = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Long, Long, Long)]
    var cur: Option[(java.time.LocalDate, java.time.LocalDate, Long, Long, Long)] = None
    var d = d0
    while (!d.isAfter(d1)) {
      val c = byDay.getOrElse(d, 0L)
      if (c.toDouble > thr) {
        cur = cur match {
          case Some((s0, _, n, pk, sm)) => Some((s0, d, n + 1, math.max(pk, c), sm + c))
          case None => Some((d, d, 1L, c, c))
        }
      } else {
        cur.foreach(x => islands += ((x._1.toString, x._2.toString, x._3, x._4, x._5)))
        cur = None
      }
      d = d.plusDays(1)
    }
    cur.foreach(x => islands += ((x._1.toString, x._2.toString, x._3, x._4, x._5)))
    assert(got.toSeq.sortBy(_._1) === islands.toSeq.sortBy(_._1))
  }

  test("q243 k-core: coreness replays against a driver peeling recompute and respects graph bounds") {
    import spark.implicits._
    val got = q("q243_brand_kcore").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rebuild the undirected co-purchase edge set
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
    val brandOf = spark.read.parquet(s"$sf0001/part.parquet")
      .select($"p_partkey", $"p_brand").as[(Long, String)].collect().toMap
    val baskets: Seq[Seq[String]] = li.map(x => (x._1, brandOf(x._2))).distinct
      .groupBy(_._1).values.map(_.map(_._2).distinct.toSeq).toSeq
    val edges: Set[(String, String)] = baskets.flatMap(bs =>
      for (a <- bs; b <- bs if a != b) yield (a, b)).toSet
    val nodes = edges.map(_._1)
    // classic min-degree peeling for coreness
    var remaining = nodes
    var coreness = nodes.map(_ -> 0L).toMap
    var k = 1L
    while (remaining.nonEmpty) {
      var changed = true
      while (changed) {
        val deg = remaining.map(n =>
          n -> edges.count(e => e._1 == n && remaining(e._2))).toMap
        val next = remaining.filter(n => deg(n) >= k)
        changed = next.size < remaining.size && next.nonEmpty
        if (next.size < remaining.size) remaining = next
      }
      if (remaining.nonEmpty) {
        coreness = coreness ++ remaining.map(_ -> k)
        k += 1
      }
    }
    assert(got === coreness)
    // sanity: coreness <= degree, and the max coreness >= triangle-rich graphs' 2
    val degOf = nodes.map(n => n -> edges.count(_._1 == n)).toMap
    got.foreach { case (b, c) => assert(c <= degOf(b), b) }
    assert(got.values.max >= 2)
  }

  test("q244 matching: ATT replays against a brute-force all-pairs nearest match") {
    import spark.implicits._
    val row = q("q244_nn_matching").collect().head
    val (nT, nC, nM, rate, att) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getDouble(3), row.getDouble(4))
    def md5hex(s0: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s0.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val y = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy($"o_custkey")
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("y"))
      .as[(Long, Long)].collect().toMap
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_custkey", round($"c_acctbal" * 100).cast("long"))
      .as[(Long, Long)].collect()
      .map { case (k, sc) =>
        (k, sc, md5hex(k.toString).charAt(0) <= '7', y.getOrElse(k, 0L))
      }
    val tr = cust.filter(_._3)
    val ct = cust.filter(!_._3)
    val cal = graft.ops.StatsQueries.MatchCaliperCents
    val matches = tr.flatMap { case (tk, sc, _, yt) =>
      val cands = ct.filter(c => math.abs(sc - c._2) <= cal)
      if (cands.isEmpty) None
      else {
        val best = cands.minBy(c => (math.abs(sc - c._2), c._1))
        Some((yt, best._4))
      }
    }
    assert(nT === tr.length.toLong && nC === ct.length.toLong)
    assert(nM === matches.length.toLong)
    assert(math.abs(rate - matches.length.toDouble / tr.length) < 1e-6)
    val expAtt = (matches.map(_._1).sum - matches.map(_._2).sum).toDouble /
      matches.length
    assert(math.abs(att - expAtt) < 5e-6, s"att $att vs $expAtt")
  }

  test("q246 interpolation: gap fill replays exactly; known days carry their own value") {
    import spark.implicits._
    val got = q("q246_linear_interpolation").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getBoolean(2)))
    val day = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy(to_date($"o_orderdate").as("d"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("c"))
      .as[(java.sql.Date, Long)].collect()
      .map { case (d, c) => d.toLocalDate -> c }.toMap
    val d0 = day.keys.minBy(_.toEpochDay)
    val d1 = day.keys.maxBy(_.toEpochDay)
    val span = (d0.toEpochDay to d1.toEpochDay).map(java.time.LocalDate.ofEpochDay)
    assert(got.length === span.length)
    val byDay = got.map(r => r._1 -> (r._2, r._3)).toMap
    span.foreach { d =>
      val (v, interp) = byDay(d)
      day.get(d) match {
        case Some(c) =>
          assert(!interp && v === c * 10000L, s"$d known")
        case None =>
          assert(interp, s"$d should be interpolated")
          val pd = Iterator.iterate(d)(_.minusDays(1)).drop(1)
            .find(day.contains).get
          val nd = Iterator.iterate(d)(_.plusDays(1)).drop(1)
            .find(day.contains).get
          val (vp, vn) = (day(pd), day(nd))
          val exp = (vp * java.time.temporal.ChronoUnit.DAYS.between(d, nd) +
            vn * java.time.temporal.ChronoUnit.DAYS.between(pd, d)) * 10000L /
            java.time.temporal.ChronoUnit.DAYS.between(pd, nd)
          assert(v === exp, s"$d interp: $v vs $exp")
          // interpolated value sits within the neighbor bracket
          assert(v >= math.min(vp, vn) * 10000L && v <= math.max(vp, vn) * 10000L)
      }
    }
    assert(got.count(_._3) > 0, "fixture calendar should have at least one gap")
  }

  test("q251 JL distortion: driver replay matches and ratios concentrate around 1") {
    import spark.implicits._
    val got = q("q251_jl_distortion")
      .select($"vec_a", $"vec_b", $"d2_orig", $"ratio")
      .as[(Long, Long, Double, Double)].collect()
    assert(got.nonEmpty)
    // Independent replay: raw embeddings + the same sign matrix, plain
    // Scala folds (no Catalyst).
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect()
      .filter(_._1 % StatsQueries.JlSampleMod == 0)
      .map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def proj(v: Array[Double]): Array[Double] =
      (0 until StatsQueries.JlK).map { j =>
        (0 until StatsQueries.JlD)
          .map(i => v(i) * StatsQueries.JlSigns(j)(i)).sum
      }.toArray
    got.foreach { case (a, b, d2o, ratio) =>
      val (va, vb) = (emb(a), emb(b))
      val eo = va.indices.map(i => (va(i) - vb(i)) * (va(i) - vb(i))).sum
      val (ya, yb) = (proj(va), proj(vb))
      val ep = ya.indices.map(j => (ya(j) - yb(j)) * (ya(j) - yb(j))).sum
      assert(math.abs(d2o - eo) < 1e-6, s"pair ($a,$b) d2_orig")
      assert(math.abs(ratio - ep / StatsQueries.JlK / eo) < 1e-6,
        s"pair ($a,$b) ratio")
      // JL concentration at k=16: generous band, but a wrong scale factor
      // (k vs d, or a missing square) lands far outside it.
      assert(ratio > 0.2 && ratio < 3.0, s"pair ($a,$b) ratio $ratio")
    }
    val mean = got.map(_._4).sum / got.length
    assert(mean > 0.7 && mean < 1.3, s"mean ratio $mean should be near 1")
  }

  test("q247 Adamic-Adar: open-pair scores match a driver graph replay") {
    import spark.implicits._
    val got = q("q247_adamic_adar")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
    val brandOf = spark.read.parquet(s"$sf0001/part.parquet")
      .select($"p_partkey", $"p_brand").as[(Long, String)].collect().toMap
    val baskets = li.map { case (ok, pk) => (ok, brandOf(pk)) }.distinct
    val nBaskets = baskets.map(_._1).distinct.length
    val pairN = baskets.groupBy(_._1).values.flatMap { bs =>
      val b = bs.map(_._2).distinct.sorted
      for (i <- b.indices; j <- i + 1 until b.length) yield (b(i), b(j))
    }.groupBy(identity).view.mapValues(_.size).toMap
    val edges = pairN.filter(_._2.toDouble >=
      StatsQueries.AaSupportFrac.toDouble * nBaskets).keySet
    val adj = (edges.toSeq ++ edges.toSeq.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brands = adj.keySet.toSeq.sorted
    val expected = (for {
      a <- brands; c <- brands if a < c && !edges((a, c))
      common = adj(a).intersect(adj(c)) if common.nonEmpty
    } yield (a, c) -> (common.size.toLong,
      common.toSeq.map(z => 1.0 / math.log(adj(z).size)).sum)).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, (n, s)) =>
      assert(got(k)._1 === n, s"$k n_common")
      assert(math.abs(got(k)._2 - s) < 1e-5, s"$k aa_score")
    }
    assert(got.nonEmpty, "graph should not be complete at the relative floor")
  }

  test("q254 Spearman: coefficients match a driver tie-averaged-rank replay") {
    import spark.implicits._
    val row = q("q254_spearman").collect().head
    val (n, rho, pear) = (row.getLong(0), row.getDouble(1), row.getDouble(2))
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_custkey", $"c_acctbal").as[(Long, Double)].collect().toMap
    val xy = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_custkey", $"o_totalprice").as[(Long, Double)].collect()
      .map { case (ck, tp) =>
        (math.round(tp * 100).toDouble, math.round(cust(ck) * 100).toDouble)
      }
    assert(n === xy.length)
    def avgRanks(v: Array[Double]): Map[Double, Double] = {
      val sorted = v.sorted
      val first = scala.collection.mutable.Map.empty[Double, Int]
      sorted.zipWithIndex.foreach { case (x, i) =>
        if (!first.contains(x)) first(x) = i + 1
      }
      val cnt = v.groupBy(identity).view.mapValues(_.length).toMap
      cnt.map { case (x, c) => x -> (first(x) + (c - 1) / 2.0) }
    }
    def pearson(a: Array[Double], b: Array[Double]): Double = {
      val nn = a.length
      val (ma, mb) = (a.sum / nn, b.sum / nn)
      val cov = a.indices.map(i => (a(i) - ma) * (b(i) - mb)).sum
      val (va, vb) = (a.map(x => (x - ma) * (x - ma)).sum,
        b.map(x => (x - mb) * (x - mb)).sum)
      cov / math.sqrt(va * vb)
    }
    val xs = xy.map(_._1); val ys = xy.map(_._2)
    val (rx, ry) = (avgRanks(xs), avgRanks(ys))
    val expRho = pearson(xs.map(rx), ys.map(ry))
    val expR = pearson(xs, ys)
    assert(math.abs(rho - expRho) < 1e-5, s"spearman $rho vs $expRho")
    assert(math.abs(pear - expR) < 1e-5, s"pearson $pear vs $expR")
    assert(rho >= -1.0 && rho <= 1.0 && pear >= -1.0 && pear <= 1.0)
  }

  test("q252 FS linkage: emitted pairs clear the weight cut, are block-consistent, and attribute flags replay") {
    import spark.implicits._
    val got = q("q252_fs_linkage").collect()
    assert(got.nonEmpty)
    val parts = spark.read.parquet(s"$sf0001/part.parquet")
      .select($"p_partkey", $"p_name", $"p_brand", $"p_type", $"p_size")
      .as[(Long, String, String, String, Int)].collect()
      .map(p => p._1 -> p).toMap
    def blk(name: String) = name.split(" ").take(2).mkString(" ")
    got.foreach { r =>
      val (ka, kb) = (r.getLong(0), r.getLong(1))
      val w = r.getDouble(6)
      assert(ka < kb, "canonical pair order")
      assert(w >= StatsQueries.FsWeightCut.toDouble, s"($ka,$kb) weight $w")
      val (pa, pb) = (parts(ka), parts(kb))
      assert(blk(pa._2) === blk(pb._2), "pairs must share the block key")
      assert(r.getBoolean(3) === (pa._3 == pb._3), "g_brand replay")
      assert(r.getBoolean(4) === (pa._4 == pb._4), "g_type replay")
      assert(r.getBoolean(5) === (pa._5 == pb._5), "g_size replay")
    }
  }
}
