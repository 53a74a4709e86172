package graft.ops

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DecimalType, DoubleType}

import Tables._

/**
 * Similarity search over the `embeddings` fixture (`Array[Float]`, dim 64).
 *
 * Brute-force cosine is the exactness baseline: scoring runs inside
 * whole-stage codegen via the native [[graft.functions.CosineSimilarity]]
 * expression, with the smaller relation broadcast so the candidate side
 * never shuffles. At 100 TB the same plans hold by blocking: broadcast the
 * query batch, scan the corpus partition-parallel, keep per-partition
 * top-k heaps (TakeOrderedAndProject / window-rank below) — plus an
 * LSH/IVF pruning stage (the MinHash banding in DedupQueries is the same
 * pattern) when the corpus side outgrows a full scan.
 */
object SimilarityQueries {

  private val NearDupThreshold = 0.45
  private val TopK = 5
  private val NumQueries = 10

  /** Fixture embedding width — the contract FixtureSchemaSpec pins (a
    * regenerated fixture with a new width fails there, not as silent
    * nulls from a zip_with length mismatch). Oracles interpolate this
    * so both engines agree on the dimension by construction. */
  private[graft] val EmbDim = 64

  /** PCA components kept by q140. */
  private[graft] val PcaK = 8

  private def embs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "embeddings")
      .select($"vec_id", $"embedding".cast(ArrayType(DoubleType)).as("emb"), $"label")
  }

  /** (vec_id, band, bv) rows of the SrpBits-bit signed-random-projection
    * signature, banded — the shared candidate spine of q121 (near-dup
    * pairs) and q207 (hard negatives). All 16 sign bits of ⟨emb, H_b⟩
    * come from ONE native codegen pass (functions.SrpSignature): each
    * per-plane dot is the same sequential left fold as
    * CosineSimilarity's loop and DuckDB's list_dot_product, so sign
    * decisions are bit-identical across engines even at the boundary.
    * Band values are pure bit arithmetic on the packed signature. */
  private def srpBandRows(s: SparkSession, e: DataFrame): DataFrame = {
    import s.implicits._
    VectorFunctions.register(s)
    val bands = (0 until SrpBits / SrpBandBits).map { j =>
      struct(lit(j).as("band"),
        shiftright($"sig", SrpBits - SrpBandBits * (j + 1))
          .bitwiseAND(lit((1 << SrpBandBits) - 1)).as("bv"))
    }
    Pin.lazily(
      e.withColumn("sig", VectorFunctions.srpSig($"emb"))
        .select($"vec_id", explode(array(bands: _*)).as("bd"))
        .select($"vec_id", $"bd.band".as("band"), $"bd.bv".as("bv")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // EXACT embedding near-dup through a BALL-COVER cell spine (r9; was
    // the broadcast-all-pairs baseline through r8). The enumeration is
    // q82's cell quantization hardened to EXACTNESS by the angular
    // triangle inequality: assign every vector to its argmax seed cell,
    // take each cell's angular RADIUS r_c = max angle(x, cent_c), and
    // admit an (ordered) cell pair iff angle(cent_c, cent_c') ≤
    // θ_τ + r_c + r_c' + ε — any qualifying pair (angle ≤ θ_τ =
    // acos(0.45)) between the cells would violate the sphere triangle
    // inequality otherwise, so recall is 1 BY THEOREM, not by fixture
    // luck (measured: 6 of 7 qualifying sf0.001 pairs CROSS cells, so
    // the naive within-cell join is not exact here). Pair enumeration
    // is then member ⋈ cell-pair ⋈ member on cell-id EQUI keys — never
    // an n² nested loop — and each pair arises once (its own cell
    // orientation), so no distinct. The exact cosine is the verify.
    // θ_τ = 63° on a 16-cell fixture admits most of the 256-cell-pair
    // spine (this fixture's similarity regime defeats pruning —
    // COVERAGE.md "Known gaps"); at corpus scale cells scale with the
    // corpus and τ sits near 1, so the admitted spine collapses to
    // near-diagonal — the same shape-over-fixture-pruning story as
    // q256. VectorSpec keeps the brute-force cross-check; the oracle
    // stays the exhaustive all-pairs set, so the hash match re-proves
    // ball-cover completeness every run.
    "q34_cosine_neardup" -> { (s, dir) =>
      import s.implicits._
      VectorFunctions.register(s)
      val e = embs(s, dir)
      val cents = e.filter($"vec_id" < Cells)
        .select($"vec_id".as("cent_id"), $"emb".as("c_emb"))
      // angle via acos of the clamped cosine (float noise can exceed
      // ±1 by an ulp); ε absorbs acos/clamp noise conservatively. Sized
      // from acos's CONDITION NUMBER, not the cosine ulp: d(acos)/dc =
      // 1/√(1−c²) blows up near |c| → 1 (a member nearly identical to
      // its centroid), so a ~1e-15 cosine error can become ~1e-8 of
      // angle — 1e-6 dominates that with three orders of margin, and the
      // extra admitted spine at Cells=16 is at most a handful of cell
      // pairs (r9 advice).
      def ang(c: Column): Column = acos(least(greatest(c, lit(-1d)), lit(1d)))
      val eps = lit(1e-6)
      val assigned = graft.plans.GroupTopK(
          e.join(broadcast(cents), lit(true))
            .withColumn("ccos", VectorFunctions.cosine($"emb", $"c_emb")),
          Seq($"vec_id"), Seq($"ccos".desc, $"cent_id".asc), 1)
        .select($"vec_id", $"cent_id".as("cell"), $"emb", ang($"ccos").as("cang"))
        .transform(Pin(_))
      val radii = assigned.groupBy($"cell").agg(max($"cang").as("r"))
      val theta = ang(lit(NearDupThreshold.toDouble))
      // 16×16 control-plane spine: ordered cell pairs surviving the
      // triangle-inequality bound (crossJoin of two ≤Cells-row frames).
      val cellPairs = cents.select($"cent_id".as("ca"), $"c_emb".as("ea"))
        .crossJoin(cents.select($"cent_id".as("cb"), $"c_emb".as("eb")))
        .join(radii.select($"cell".as("ca"), $"r".as("ra")), Seq("ca"))
        .join(radii.select($"cell".as("cb"), $"r".as("rb")), Seq("cb"))
        .filter(ang(VectorFunctions.cosine($"ea", $"eb")) <=
          theta + $"ra" + $"rb" + eps)
        .select($"ca", $"cb".as("cpb"))
      val a = assigned.select($"vec_id".as("vec_a"), $"emb".as("emb_a"),
        $"cell".as("ca"))
      val b = assigned.select($"vec_id".as("vec_b"), $"emb".as("emb_b"),
        $"cell".as("cb"))
      a.join(broadcast(cellPairs), Seq("ca"))
        .join(b, $"cpb" === $"cb" && $"vec_a" < $"vec_b")
        .withColumn("cos", VectorFunctions.cosine($"emb_a", $"emb_b"))
        .filter($"cos" >= NearDupThreshold)
        .select($"vec_a", $"vec_b", round($"cos", 6).as("cos_sim"))
        .orderBy($"vec_a", $"vec_b")
    },

    // Brute-force ANN top-k: first NumQueries vectors are the query batch
    // (broadcast); per-query ranking is a window over the scored scan.
    "q35_ann_topk" -> { (s, dir) =>
      import s.implicits._
      VectorFunctions.register(s)
      val e = embs(s, dir)
      val q = e.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"emb".as("q_emb"))
      val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
      e.join(broadcast(q), $"vec_id" =!= $"query_id")
        .withColumn("cos", VectorFunctions.cosine($"emb", $"q_emb"))
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= TopK)
        .select($"query_id", $"rk".cast("long").as("rk"),
          $"vec_id".as("neighbor_id"), round($"cos", 6).as("cos_sim"))
        .orderBy($"query_id", $"rk")
    },

    // Same search as q35 but through the native TopKPairs aggregate:
    // per-partition bounded heaps reduce map-side, so only k pairs per
    // partition per query cross the shuffle (the window form shuffles
    // every scored row). Same deterministic order ⇒ same oracle as q35.
    "q35b_ann_topk_agg" -> { (s, dir) =>
      import s.implicits._
      VectorFunctions.register(s)
      val e = embs(s, dir)
      val q = e.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"emb".as("q_emb"))
      e.join(broadcast(q), $"vec_id" =!= $"query_id")
        .withColumn("cos", VectorFunctions.cosine($"emb", $"q_emb"))
        .groupBy($"query_id")
        .agg(VectorFunctions.topk($"cos", $"vec_id", TopK).as("top"))
        .select($"query_id", posexplode($"top").as(Seq("i", "p")))
        .select($"query_id", ($"i" + 1).cast("long").as("rk"),
          $"p.id".as("neighbor_id"), round($"p.score", 6).as("cos_sim"))
        .orderBy($"query_id", $"rk")
    },

    // Per-label centroids — elementwise mean via posexplode + one hash agg.
    // NOTE the deliberate departure from the decimal-sum policy: decimal
    // casts of float-derived doubles land on EXACT rounding ties at any
    // scale (dyadic values like m·2⁻¹³ tie at every decimal scale), where
    // the engines' rounding modes diverge — observed at both sf0.01 and
    // sf0.1. Plain double sums differ across engines only by summation
    // order (~1e-13 relative here), so ROUND(mean, 6) absorbs the noise
    // with negligible tie exposure (a true mean within 1e-14 of a 5e-7
    // boundary).
    "q36_label_centroids" -> { (s, dir) =>
      import s.implicits._
      embs(s, dir)
        .select($"label", posexplode($"emb").as(Seq("pos", "v")))
        .groupBy($"label", $"pos".cast("long").as("pos"))
        .agg(count(lit(1)).as("n"),
          round(sum($"v") / count(lit(1)), 6).as("mean_v"))
        .orderBy($"label", $"pos")
    }
  )

  // IVF geometry: Cells coarse cells, Probes probed per query. Probes is
  // deliberately high relative to Cells (recall over speed) because this
  // fixture's similarity regime is weak — nearest neighbors sit at
  // cos 0.3–0.5, so cell membership is only loosely correlated with
  // neighborhood; production corpora with tight clusters run 1024+ cells
  // and probe ~1% of them. Recall vs the exact q35 answer is measured in
  // SimilaritySpec; the oracle gate is rows-only (approximate by design).
  private val Cells = 16
  private val Probes = 6

  /** q153 MMR geometry: pool of 20 relevance candidates per query, pick 5,
    * λ = 0.7 relevance vs redundancy. */
  private val MmrPool = 20
  private val MmrK = 5
  private val MmrLambda = 0.7

  /** q130 PQ geometry: 16 subspaces of 4 dims (finer than the classic 8×8
    * split — at this fixture's weak-similarity margins the extra subspace
    * resolution is worth the 16- vs 8-byte code) and a 50-deep ADC
    * shortlist ahead of the exact re-rank. */
  private val PqM = 16
  private val PqShortlist = 50

  /** q82: within-cell cosine at or above this marks a semantic duplicate.
    * 0.40 sits just under the fixture's near-dup band (q34's 0.45), so the
    * cell partition genuinely prunes — measured 11–19 drops at sf0.01/0.001
    * versus thousands of within-cell candidate pairs. */
  private val SemDedupThreshold = 0.40

  val extraQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-vector array stats: built-in array_min/max + an L2 norm via a
    // sequential fold (matches list_dot_product's evaluation order).
    "q46_embedding_stats" -> { (s, dir) =>
      import s.implicits._
      embs(s, dir)
        .select($"vec_id", size($"emb").cast("long").as("dim"),
          array_min($"emb").as("amin"), array_max($"emb").as("amax"),
          sqrt(expr("aggregate(emb, 0D, (a, x) -> a + x * x)")).as("l2_norm"))
        .orderBy($"vec_id")
    },

    // IVF ANN — the scale path past brute force (q35/q35b). Structure:
    //  1. coarse quantizer: Cells deterministic seed vectors (lowest
    //     vec_ids stand in for trained k-means centroids — reproducible,
    //     no training dependency);
    //  2. invert: every corpus vector is assigned to its nearest cell
    //     (one broadcast of the tiny centroid set, one argmax — the
    //     inverted file, built once and reusable across queries);
    //  3. probe: each query scores only vectors in its Probes nearest
    //     cells — the equi-join on cell id IS the pruning: candidate
    //     generation is a hash join, never a cross join;
    //  4. exact re-rank of candidates through the codegen'd cosine +
    //     GroupTopK bounded heaps.
    // At 100 TB: the inverted file is a partitioned table bucketed by
    // cell; a query batch touches Probes/Cells of the corpus, and the
    // only corpus-wide shuffle is the one-off cell assignment.
    "q54_ann_ivf" -> { (s, dir) =>
      import s.implicits._
      VectorFunctions.register(s)
      val e = embs(s, dir)
      val cents = e.filter($"vec_id" < Cells)
        .select($"vec_id".as("cent_id"), $"emb".as("c_emb"))
      // Inverted file: argmax cell per vector (ties → lowest cent_id),
      // expressed as GroupTopK k=1 — whole-row top-1 via bounded heaps.
      // (An agg formulation would carry the embedding array through the
      // aggregation buffer, which forces SortAggregate: array-typed
      // buffers are not hash-aggregable. The heap keeps the full row with
      // no buffer constraint, and each map task already reduces to one
      // row per vector before the exchange.)
      val cellScores = e.join(broadcast(cents), lit(true))
        .withColumn("ccos", VectorFunctions.cosine($"emb", $"c_emb"))
      val assigned = graft.plans.GroupTopK(cellScores,
          Seq($"vec_id"), Seq($"ccos".desc, $"cent_id".asc), 1)
        .select($"vec_id", $"cent_id".as("cell"), $"emb")
      // Probe list: the Probes nearest cells per query vector.
      val q = e.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"emb".as("q_emb"))
      val wp = Window.partitionBy($"query_id").orderBy($"pcos".desc, $"cent_id")
      val probes = q.join(broadcast(cents), lit(true))
        .withColumn("pcos", VectorFunctions.cosine($"q_emb", $"c_emb"))
        .withColumn("pk", row_number().over(wp))
        .filter($"pk" <= Probes)
        .select($"query_id", $"q_emb", $"cent_id".as("cell"))
      // Candidates = inverted-file rows of probed cells; exact re-rank.
      val scored = assigned.join(broadcast(probes), "cell")
        .filter($"vec_id" =!= $"query_id")
        .withColumn("cos", VectorFunctions.cosine($"emb", $"q_emb"))
      val wr = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
      graft.plans.GroupTopK(scored, Seq($"query_id"), Seq($"cos".desc, $"vec_id".asc), TopK)
        .withColumn("rk", row_number().over(wr).cast("long"))
        .select($"query_id", $"rk", $"vec_id".as("neighbor_id"),
          round($"cos", 6).as("cos_sim"))
        .orderBy($"query_id", $"rk")
    },

    // Symmetric int8 quantization of the embedding column — the storage/
    // bandwidth step before an ANN index ships to serving (4× smaller than
    // float32, 8× than the double working form). Per-row higher-order
    // functions only: no shuffle, no UDF, stays inside codegen. floor
    // (not round) keeps the engines bit-identical: round ties at exact
    // .5 products (dyadic floats reach them), floor has no tie to break —
    // and with scale = 127/max|x| the products stay in [-127, 127], so
    // no clipping branch is needed. The per-vector MSE is a sequential
    // fold; ROUND(…,6) absorbs any engine fold-order noise (~1e-13).
    "q70_quantize_error" -> { (s, dir) =>
      import s.implicits._
      embs(s, dir)
        .withColumn("max_abs", expr("array_max(transform(emb, x -> abs(x)))"))
        .filter($"max_abs" > 0.0)
        .withColumn("scale", lit(127.0) / $"max_abs")
        .withColumn("q", expr("transform(emb, x -> CAST(floor(x * scale) AS BIGINT))"))
        .withColumn("mse", round(
          expr("aggregate(zip_with(emb, q, (x, qi) -> (x - qi / scale) * (x - qi / scale)), 0D, (a, v) -> a + v)")
            / size($"emb"), 6))
        .select($"vec_id", $"scale", expr("array_min(q)").as("q_min"),
          expr("array_max(q)").as("q_max"), $"mse")
        .orderBy($"vec_id")
    },

    // SemDeDup-style semantic deduplication (Abbas et al. 2023): partition
    // the embedding space into cells with a coarse quantizer, then look for
    // near-duplicates ONLY within a cell — the approximation that makes
    // embedding-level dedup tractable at corpus scale, since the all-pairs
    // comparison (q34's fixture-only baseline) never forms: the pair join
    // is an equi-join on cell id, and cross-cell pairs are deliberately
    // out of scope (the method's documented recall trade). Cells here are
    // the q54 deterministic seed quantizer (lowest vec_ids) so the whole
    // operator — assignment included — is oracle-expressible; swapping in
    // the q72 trained k-means centroids changes only the `cents` frame.
    // Keep policy: a vector is dropped when a lower-id vector in its cell
    // has cosine ≥ 0.4; dup_of records the lowest such keeper-candidate.
    // At 100 TB: the inverted file is the bucketed table q54 describes,
    // and each cell's pair search runs independently — per-cell work is
    // |cell|², bounded by balanced cells (k scales with corpus), never n².
    "q82_semdedup" -> { (s, dir) =>
      import s.implicits._
      VectorFunctions.register(s)
      val e = embs(s, dir)
      val cents = e.filter($"vec_id" < Cells)
        .select($"vec_id".as("cent_id"), $"emb".as("c_emb"))
      val cellScores = e.join(broadcast(cents), lit(true))
        .withColumn("ccos", VectorFunctions.cosine($"emb", $"c_emb"))
      // Pinned: three consumers (both pair-join sides + the final keep
      // join) would otherwise each re-execute the assignment subtree.
      val assigned = graft.plans.GroupTopK(cellScores,
          Seq($"vec_id"), Seq($"ccos".desc, $"cent_id".asc), 1)
        .select($"vec_id", $"cent_id".as("cell"), $"emb")
        .transform(Pin(_))
      val dup = assigned.as("a").join(assigned.as("b"),
          col("a.cell") === col("b.cell") && col("b.vec_id") < col("a.vec_id"))
        .withColumn("cos", VectorFunctions.cosine(col("a.emb"), col("b.emb")))
        .filter($"cos" >= SemDedupThreshold)
        .groupBy(col("a.vec_id").as("vec_id"))
        .agg(min(col("b.vec_id")).as("dup_of"))
      assigned.join(dup, Seq("vec_id"), "left")
        .select($"vec_id", $"cell".cast("long").as("cell"),
          when($"dup_of".isNull, 1L).otherwise(0L).as("keep"), $"dup_of")
        .orderBy($"vec_id")
    },

    // Trained IVF cells: spherical k-means (graft.ops.KMeans) replaces
    // q54's seed-vector stand-ins with Lloyd-refined centroids, then
    // reports the resulting cell population and coherence. Rows-only by
    // design (iterative float optimization has no SQL-expressible oracle);
    // the training invariants — monotone objective, total assignment,
    // argmax-consistent cells — are pinned by KMeansSpec instead.
    "q72_kmeans_cells" -> { (s, dir) =>
      import s.implicits._
      val e = embs(s, dir).select($"vec_id", $"emb")
      val model = graft.ops.KMeans.fit(e, k = Cells, iters = 3)
      // avg_cos rides e12 fixed-point (order-free exact sum) and emits
      // RAW — FULL oracle since r8: KMeans.fit's update is fixed-point
      // too, so the oracle replays the identical Lloyd arithmetic
      // (unrolled rounds, list_dot_product cosine parity).
      graft.ops.KMeans.assign(e, model.centroids)
        .groupBy($"cell")
        .agg(count(lit(1)).as("n_vectors"),
          sum(expr("cast(floor(cos * 1e12) as bigint)")
            .cast(DecimalType(38, 0))).as("sc"))
        // final ROUND(6): the e12 floor happens per ROW, and a 1-ulp
        // cross-version drift in the cosine primitive can flip one
        // row's floor — shifting the exact sum by 1 and the avg by
        // 1e-12/n, far below the 6-dp grain (ORACLE.md float-chain
        // corollary; half-ties are measure-zero for this chain).
        .select($"cell".cast("long").as("cell"), $"n_vectors",
          round(($"sc".cast("double") / lit(1e12)) /
            $"n_vectors".cast("double"), 6).as("avg_cos"))
        .orderBy($"cell")
    },

    // Product-quantization ANN (asymmetric distance + exact re-rank —
    // Jégou et al. 2011, the IVF-ADC shape) — the memory-side scale path
    // that composes with IVF's scan pruning: each corpus vector is
    // replaced by M=16 codebook indices (16 bytes vs 256 for the raw
    // floats), trained by ops/Pq (one codegen'd encode pass + one bounded
    // aggregate per Lloyd iteration). The shortlist phase never touches
    // raw corpus vectors: the query batch's EXACT per-(subspace, codeword)
    // distance tables (Q·M·K = 2560 rows — control-plane data, broadcast)
    // join the exploded codes, Σ over subspaces approximates ‖q−x‖², and
    // GroupTopK keeps the best PqShortlist per query. Only those
    // Q·PqShortlist rows re-join the raw vectors for an exact cosine
    // re-rank — the phase split that makes a 100 TB corpus searchable: the
    // full scan reads 16-byte codes, full-precision floats are fetched for
    // 50 rows per query. Vectors are unit-normalized first so approx-L2
    // ranks like cosine (‖a−b‖² = 2−2cos); recall vs the exact q35 answer
    // is measured in VectorSpec. FULL oracle since r8: Pq.fit's Lloyd
    // updates ride e12 fixed-point (the KMeans/q72 discipline), the ADC
    // tables quantize to exact LONGs, and the oracle unrolls the 3
    // training rounds with the subspace as a COLUMN (the q243 k-slice
    // trick) — all 16 subspaces train in one shared CTE chain.
    "q130_ann_pq" -> { (s, dir) =>
      import s.implicits._
      VectorFunctions.register(s)
      val e = embs(s, dir)
        .withColumn("nrm", sqrt(expr("aggregate(emb, 0D, (a, x) -> a + x * x)")))
        .filter($"nrm" > 0.0)
        .select($"vec_id", expr("transform(emb, x -> x / nrm)").as("emb"))
        .transform(Pin.lazily(_)) // training iterations + encode + re-rank reuse it
      val model = Pq.fit(e, iters = 3, m = PqM)
      val codes = e.select($"vec_id",
        graft.functions.VectorFunctions.pqEncode(s, $"emb", model.codebooks).as("codes"))
      // Exact distance tables for the Q query vectors (collected: Q rows of
      // control data, same policy as the k-means centroids).
      val dsub = model.codebooks.head.head.length
      val qvecs = e.filter($"vec_id" < NumQueries).collect()
        .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Double]]("emb").toIndexedSeq)
      // Distance-table entries quantize to e12 LONGs so per-(query, vec)
      // approximate distances are EXACT integer sums — order-free across
      // partitionings (a float Σ over the M code cells could flip a
      // shortlist membership on a near-tie) and replayable by the oracle.
      val dtab = qvecs.flatMap { case (qid, q) =>
        model.codebooks.zipWithIndex.flatMap { case (sub, m) =>
          sub.zipWithIndex.map { case (cw, k) =>
            val d = cw.zipWithIndex.map { case (c, i) =>
              val diff = q(m * dsub + i) - c; diff * diff
            }.sum
            (qid, m, k, math.floor(d * 1e12).toLong)
          }
        }
      }.toSeq.toDF("query_id", "m", "k", "qd")
      val adist = codes
        .select($"vec_id", posexplode($"codes").as(Seq("m", "k")))
        .join(broadcast(dtab), Seq("m", "k"))
        .filter($"vec_id" =!= $"query_id")
        .groupBy($"query_id", $"vec_id")
        .agg(sum($"qd").as("adist"))
      val shortlist = graft.plans.GroupTopK(adist, Seq($"query_id"),
        Seq($"adist".asc, $"vec_id".asc), PqShortlist)
      val qframe = broadcast(qvecs.toSeq.toDF("query_id", "q_emb"))
      val reranked = shortlist
        .join(e, "vec_id") // Q·PqShortlist rows fetch full precision
        .join(qframe, "query_id")
        .withColumn("cos", VectorFunctions.cosine($"emb", $"q_emb"))
      graft.plans.GroupTopK(reranked, Seq($"query_id"),
          Seq($"cos".desc, $"vec_id".asc), TopK)
        .withColumn("rk", row_number().over(
          Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id".asc)))
        .select($"query_id", $"rk".cast("long").as("rk"),
          $"vec_id".as("neighbor_id"), round($"cos", 6).as("cos_sim"))
        .orderBy($"query_id", $"rk")
    },

    // Signed-random-projection (hyperplane) LSH — the third pruning family
    // next to MinHash banding (token sets, q32) and IVF cells (trained
    // partitions, q54): SrpBits sign bits of fixed pseudo-random
    // projections, banded so only same-band-signature pairs ever join.
    // Collision probability per bit is 1 − θ/π (Goemans–Williamson), so
    // close pairs collide in some band with high probability while the
    // n² pair space never materializes — candidates are an equi-join on
    // (band, signature), then exact-cosine verification prunes to the
    // reported pairs. At corpus scale: widen to 64–256 bits and more
    // bands (recall/cost dial); the plan shape — project, band, equi-join,
    // verify — is unchanged. Hyperplanes are md5-derived (srpUnit), so the
    // ENTIRE pipeline — projections, sign bits, band packing, candidate
    // set, verification — is replayed by the DuckDB oracle and
    // hash-checked; fixture-scale recall is pinned in VectorSpec.
    "q121_srp_lsh" -> { (s, dir) =>
      import s.implicits._
      val e = embs(s, dir).select($"vec_id", $"emb")
      val sig = srpBandRows(s, e)
      val cand = sig.as("a").join(sig.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.vec_id") < col("b.vec_id"))
        .groupBy(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
        .agg(count(lit(1)).as("n_bands"))
      cand
        .join(e.select($"vec_id".as("vec_a"), $"emb".as("emb_a")), "vec_a")
        .join(e.select($"vec_id".as("vec_b"), $"emb".as("emb_b")), "vec_b")
        .withColumn("cos", VectorFunctions.cosine($"emb_a", $"emb_b"))
        .filter($"cos" >= SrpThreshold)
        .select($"vec_a", $"vec_b", $"n_bands", round($"cos", 6).as("cos_sim"))
        .orderBy($"vec_a", $"vec_b")
    },

    // -------------------------------------------- hard-negative mining
    // Contrastive-training data prep: for each anchor, the most-similar
    // vectors with a DIFFERENT label — the "hard negatives" that teach a
    // metric model its decision boundary (easy negatives are information-
    // free). Candidates come from the SAME SRP band spine as q121 — a
    // hard negative is by definition close in embedding space, which is
    // exactly what hyperplane-LSH collisions surface — so the n² pair
    // space never materializes; label mismatch filters AFTER the
    // candidate equi-join (cheap bit compare), exact cosine verifies, and
    // per-anchor top-3 rides GroupTopK (bounded heaps, no window sort).
    // Asymmetric pairs (both directions kept): every anchor needs ITS
    // negatives regardless of id order. Fully oracle-replayed — the
    // md5-derived hyperplanes make the whole pipeline SQL-expressible.
    "q207_hard_negatives" -> { (s, dir) =>
      import s.implicits._
      val e = embs(s, dir)
      val sig = srpBandRows(s, e.select($"vec_id", $"emb"))
      val cand = sig.as("a").join(sig.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("anchor"), col("b.vec_id").as("cand"))
        .distinct()
      val scored = cand
        .join(e.select($"vec_id".as("anchor"), $"emb".as("emb_a"),
          $"label".as("label_a")), "anchor")
        .join(e.select($"vec_id".as("cand"), $"emb".as("emb_b"),
          $"label".as("label_b")), "cand")
        .filter($"label_a" =!= $"label_b")
        .withColumn("cos", VectorFunctions.cosine($"emb_a", $"emb_b"))
      graft.plans.GroupTopK(scored, Seq($"anchor"),
          Seq($"cos".desc, $"cand".asc), 3)
        .select($"anchor".as("vec_id"), $"cand".as("neg_id"),
          $"label_b".as("neg_label"), round($"cos", 6).as("cos_sim"))
        .orderBy($"vec_id", $"neg_id")
    },

    // Train/val embedding leakage — decontamination's semantic face: q53/q73
    // catch verbatim n-gram overlap, this catches near-duplicate MEANING
    // (a paraphrased eval question still poisons the split). Split rule is
    // q52's md5-first-hex-digit family on vec_id (c,d → val; ≤b → train;
    // e,f → test, excluded). The val side is a small fixed fraction (2/16),
    // so it broadcasts — the q35 pattern: corpus side scans partition-
    // parallel, never shuffles; per-val argmax rides GroupTopK k=1.
    "q123_embed_leakage" -> { (s, dir) =>
      import s.implicits._
      VectorFunctions.register(s)
      val e = embs(s, dir)
        .withColumn("h", substring(md5($"vec_id".cast("string")), 1, 1))
      val train = e.filter($"h" <= "9" || $"h" === "a" || $"h" === "b")
        .select($"vec_id".as("train_id"), $"emb".as("t_emb"))
      val valSide = e.filter($"h" === "c" || $"h" === "d")
        .select($"vec_id".as("val_id"), $"emb".as("v_emb"))
      val scored = train.join(broadcast(valSide), lit(true))
        .withColumn("cos", VectorFunctions.cosine($"t_emb", $"v_emb"))
      graft.plans.GroupTopK(scored, Seq($"val_id"),
          Seq($"cos".desc, $"train_id".asc), 1)
        .select($"val_id".as("vec_id"), $"train_id".as("nearest_train_id"),
          round($"cos", 6).as("cos_sim"),
          ($"cos" >= SemDedupThreshold).as("leaked"))
        .orderBy($"vec_id")
    },

    // Embedding covariance — the statistical face of the corpus (feeds
    // PCA/whitening, q140). One distributed pass; pair generation happens
    // INSIDE the scan stage (Generate feeding the partial HashAggregate),
    // so the shuffle carries only the d(d+1)/2 = 2080 co-moment groups
    // per map task — never the n·d²/2 exploded stream. At 100 TB the
    // reduce side is still 2080 rows.
    "q139_embedding_covariance" -> { (s, dir) =>
      import s.implicits._
      coMoments(s, dir)
        .select($"i", $"j", $"n",
          // + 0.0 canonicalizes IEEE -0.0 (a near-zero covariance rounds
          // to the signed zero of whichever side it approached — engine-
          // dependent; the driver's hash compare distinguishes the two).
          (round(($"sxy" - $"sx" * $"sy" / $"n") / ($"n" - 1), 6) + lit(0d)).as("cov"))
        .orderBy($"i", $"j")
    },

    // PCA projection: eigendecompose the q139 covariance on the driver
    // (64×64 control-plane matrix — the k-means-centroid pattern, see
    // ops/Eigen.scala for the scale rationale), broadcast the top-PcaK
    // components as literals, and project every embedding in one
    // codegen'd map stage: each coordinate is a fixed 64-term expression
    // tree (no interpreted HOF lambda in the hot path — the SrpSignature
    // lesson), evaluated left-to-right like a sequential fold. Full
    // oracle since r9 via dynamicOracles: the eigenvector/mean literals
    // interpolate into the SQL at Verify-dump time and DuckDB re-runs
    // the identical folds over the raw parquet (the eigensolve itself
    // isn't ANSI SQL — VectorSpec gates orthonormality, trace
    // preservation, Rayleigh residuals, descending order,
    // coordinate-variance ≈ eigenvalue, and sign-fixed determinism).
    "q140_pca_project" -> { (s, dir) =>
      import s.implicits._
      val d = EmbDim
      val (_, mu, cov) = covStats(s, dir) // 2080 control-plane rows, memoized
      val (_, vecs) = Eigen.symmetric(cov)
      val pcs = (0 until PcaK).map { k =>
        val v = vecs(k)
        // + 0.0: canonicalize -0.0 (q139 note) — a centered coordinate
        // rounding to zero must hash identically across partition layouts.
        (round((0 until d).map(i => ($"emb".getItem(i) - lit(mu(i))) * lit(v(i)))
          .reduce(_ + _), 6) + lit(0d)).as(s"pc$k")
      }
      embs(s, dir).select(($"vec_id" +: pcs): _*).orderBy($"vec_id")
    },

    // PCA WHITENING — q140's projection rescaled per component by
    // 1/√λₖ so every kept coordinate has unit (sample) variance: the
    // standard embedding preprocessing before cosine-based retrieval or
    // clustering when leading components would otherwise dominate
    // distances. The inverse-root eigenvalues are control-plane
    // literals computed next to the eigenvectors; the per-row plan is
    // the same codegen'd 64-term fold with ONE extra multiply, and the
    // dump-time dynamic oracle replays it literal-for-literal.
    // VectorSpec pins unit variance per whitened coordinate.
    "q275_pca_whiten" -> { (s, dir) =>
      import s.implicits._
      val d = EmbDim
      val (_, mu, cov) = covStats(s, dir)
      val (lam, vecs) = Eigen.symmetric(cov)
      val ws = (0 until PcaK).map { k =>
        require(lam(k) > 0, s"non-positive eigenvalue $k: ${lam(k)}")
        val v = vecs(k)
        val inv = 1.0 / math.sqrt(lam(k))
        (round((0 until d).map(i => ($"emb".getItem(i) - lit(mu(i))) * lit(v(i)))
          .reduce(_ + _) * lit(inv), 6) + lit(0d)).as(s"w$k")
      }
      embs(s, dir).select(($"vec_id" +: ws): _*).orderBy($"vec_id")
    },

    // MMR-diversified retrieval (Carbonell & Goldstein 1998 maximal
    // marginal relevance): re-rank each query's neighbors to trade
    // relevance against redundancy — score λ·cos(q,c) − (1−λ)·max_s
    // cos(c,s) over already-picked s. The standard fix for ANN results
    // that return five copies of the same near-duplicate document.
    //
    // Scale shape: relevance scoring + GroupTopK bound the candidate
    // pool to MmrPool per query BEFORE anything quadratic happens; the
    // greedy selection then runs per group over ≤ MmrPool rows inside
    // mapGroups — bounded state, the (c, s) pairwise cosines never leave
    // the task. Deterministic: argmax ties break to the lower vec_id and
    // the pairwise cosine replays the codegen expression's fold order.
    // Rows-only (greedy iteration isn't ANSI SQL); VectorSpec recomputes
    // the whole pipeline exhaustively.
    "q153_mmr_diversify" -> { (s, dir) =>
      import s.implicits._
      VectorFunctions.register(s)
      val e = embs(s, dir)
      val q = e.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"emb".as("q_emb"))
      val scored = e.join(broadcast(q), $"vec_id" =!= $"query_id")
        .withColumn("cos", VectorFunctions.cosine($"emb", $"q_emb"))
      val pool = graft.plans.GroupTopK(scored, Seq($"query_id"),
          Seq($"cos".desc, $"vec_id".asc), MmrPool)
        .select($"query_id", $"vec_id", $"cos", $"emb")
        .as[(Long, Long, Double, Seq[Double])]
      pool.groupByKey(_._1)
        .flatMapGroups { (qid, it) =>
          val cands = it.map { case (_, id, cos, emb) => (id, cos, emb.toArray) }
            .toArray.sortBy { case (id, cos, _) => (-cos, id) }
          def fcos(a: Array[Double], b: Array[Double]): Double = {
            var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
            while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
            dot / (math.sqrt(na) * math.sqrt(nb))
          }
          val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
          val pickedEmb = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
          val used = Array.fill(cands.length)(false)
          var exhausted = false
          while (!exhausted && picked.length < MmrK && picked.length < cands.length) {
            var best = -1; var bestScore = Double.NegativeInfinity
            for (ci <- cands.indices if !used(ci)) {
              val (_, cos, emb) = cands(ci)
              val red = if (pickedEmb.isEmpty) 0.0
                        else pickedEmb.map(p => fcos(emb, p)).max
              val sc = MmrLambda * cos - (1 - MmrLambda) * red
              if (sc > bestScore || (sc == bestScore && best >= 0 &&
                  cands(ci)._1 < cands(best)._1)) {
                best = ci; bestScore = sc
              }
            }
            // A zero-norm embedding scores NaN against everything (NaN
            // compares false both ways) — if every remaining candidate is
            // degenerate, stop rather than index used(-1).
            if (best < 0) exhausted = true
            else {
              used(best) = true
              picked += ((cands(best)._1, cands(best)._2, bestScore))
              pickedEmb += cands(best)._3
            }
          }
          picked.zipWithIndex.iterator.map { case ((id, cos, sc), i) =>
            // ROUND(6), not raw: these are GENERIC float chains (cosine
            // folds), where 6-dp half-ties are measure-zero - unlike the
            // integer-ratio divisions that caused the r7 ROUND reds -
            // and the grain absorbs any cross-version drift in DuckDB's
            // list_dot_product evaluation order (ORACLE.md rule 1's
            // float-chain corollary). HALF_UP matches SQL ROUND.
            (qid, (i + 1).toLong, id,
              BigDecimal(cos).setScale(6, BigDecimal.RoundingMode.HALF_UP)
                .toDouble + 0.0,
              BigDecimal(sc).setScale(6, BigDecimal.RoundingMode.HALF_UP)
                .toDouble + 0.0)
          }
        }
        .toDF("query_id", "rank", "vec_id", "cos_sim", "mmr_score")
        .orderBy($"query_id", $"rank")
    },

    // PCA compression audit — the sizing curve for embedding compression
    // decisions: for each k ≤ PcaK, the MEASURED mean squared
    // reconstruction error of projecting onto the top-k components,
    // next to the THEORETICAL value (Σ_{j>k} λⱼ — the eigenvalue tail).
    // The two columns cross-check each other: a drifting eigensolve, a
    // mis-centered projection, or a wrong component order shows up as
    // measured ≠ theory (VectorSpec pins their agreement; the query is
    // its own audit). One distributed pass per audit: the residual
    // ‖x − μ − Σₖ⟨x−μ,vₖ⟩vₖ‖² expands to ‖x−μ‖² − Σₖ⟨x−μ,vₖ⟩², so the
    // scan computes k+1 codegen'd dot products per row — no
    // reconstruction materialized, no second join.
    "q150_pca_reconstruction" -> { (s, dir) =>
      import s.implicits._
      val d = EmbDim
      val (n, mu, cov) = covStats(s, dir)
      val (lam, vecs) = Eigen.symmetric(cov)
      def dotSq(v: Array[Double]): Column = {
        val p = (0 until d).map(i => ($"emb".getItem(i) - lit(mu(i))) * lit(v(i)))
          .reduce(_ + _)
        p * p
      }
      val centeredSq: Column =
        (0 until d).map(i => ($"emb".getItem(i) - lit(mu(i))) *
          ($"emb".getItem(i) - lit(mu(i)))).reduce(_ + _)
      val proj = embs(s, dir).select(
        (centeredSq.as("c2") +: (0 until PcaK).map(k => dotSq(vecs(k)).as(s"p$k"))): _*)
      val agg = proj.agg(avg($"c2").as("c2m"),
        (0 until PcaK).map(k => avg(col(s"p$k")).as(s"a$k")): _*).collect()(0)
      val c2 = agg.getDouble(0)
      // Sample-vs-population: eigenvalues come from the (n−1)-divisor
      // covariance; the measured means divide by n — rescale once.
      val f = (n - 1).toDouble / n
      // BigDecimal HALF_UP, not math.rint: DuckDB ROUND on DOUBLE is
      // half-up, so the oracle pairing follows the q153 convention.
      def r6(x: Double): Double =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      val out = (1 to PcaK).map { k =>
        val measured = c2 - (1 to k).map(j => agg.getDouble(j)).sum
        val theory = f * lam.drop(k).sum
        (k.toLong, r6(measured), r6(theory))
      }
      out.toDF("k", "measured_mse", "theory_mse").orderBy($"k")
    },

    // Label-centroid silhouette — embedding-space quality audit of the
    // fixture's class structure (are labels geometrically coherent?).
    // Centroids: n·d exploded rows partial-aggregate to |L|·d = 640
    // groups, assembled into a 10-row centroid frame that BROADCASTS;
    // each vector then scores 10 codegen'd cosines and reduces to its
    // own-vs-nearest-other distances. Simplified (centroid) silhouette —
    // the full pairwise form is O(n²) and adds nothing at corpus scale.
    "q142_label_silhouette" -> { (s, dir) =>
      import s.implicits._
      VectorFunctions.register(s)
      val e = embs(s, dir)
      val cent = e.select($"label", posexplode($"emb").as(Seq("i", "x")))
        .groupBy($"label", $"i").agg(avg($"x").as("c"))
        .groupBy($"label")
        .agg(expr("transform(array_sort(collect_list(struct(i, c))), p -> p.c)").as("cent"))
        .select($"label".as("clabel"), $"cent")
      val ab = e.crossJoin(broadcast(cent))
        .withColumn("dist", lit(1d) - VectorFunctions.cosine($"emb", $"cent"))
        .groupBy($"vec_id", $"label")
        .agg(min(when($"clabel" === $"label", $"dist")).as("a"),
          min(when($"clabel" =!= $"label", $"dist")).as("b"))
      ab.select($"label", (($"b" - $"a") / greatest($"a", $"b")).as("sil"))
        .groupBy($"label")
        .agg(count(lit(1)).as("n_vecs"), round(avg($"sil"), 6).as("avg_silhouette"))
        .orderBy($"label")
    },

    // ---------------------- k-center greedy coreset (farthest-point)
    // Diversity-maximizing exemplar selection — the data-PRUNING dual of
    // q82's redundancy removal: pick KCenterK vectors so every vector is
    // close to SOME pick (Gonzalez 1985's 2-approximation to the k-center
    // objective; the seeding geometry k-means++ samples from). Round 1
    // seeds at the lowest vec_id; each later round takes the vector
    // FARTHEST from its nearest already-picked center (ties to the lower
    // vec_id). Scale shape: k sequential corpus scans, each ONE codegen'd
    // min-over-≤k-literal-centers distance map + a TakeOrderedAndProject
    // k=1 reduce — the textbook FPS cost (at larger k, switch to
    // k-means++-style oversampling: sample Θ(k) per scan in O(log k)
    // rounds, then condense; same distance map). Only 1-row argmaxes
    // reach the driver (the KMeans control-plane convention), memoized
    // per (application, dir) so bench iterations don't re-run the loop.
    // Determinism: squared distance is the same left-associated 64-term
    // fold both engines (q251's d2 builder; centers re-enter Spark as
    // collected literals, bit-exact), argmax compares raw doubles with
    // exact-tie fallback to vec_id, and sel_dist rounds once at 6 dp on
    // emission only.
    "q270_kcenter_coreset" -> { (s, dir) =>
      import s.implicits._
      val picks = kcenterPicks(s, dir)
      s.createDataFrame(picks.zipWithIndex.map { case ((id, dOpt), i) =>
          (i + 1L, id, dOpt.map(x =>
            BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble + 0.0))
        })
        .toDF("pick_round", "vec_id", "sel_dist")
        .orderBy($"pick_round")
    }
  )

  /** q270: coreset size. 8 keeps the unrolled oracle readable while the
    * greedy still runs multiple genuinely distance-driven rounds. */
  private[graft] val KCenterK = 8

  private val kcenterCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Long, Option[Double])]]

  /** The greedy FPS loop: (vec_id, selection distance) per round, round 1
    * seeded at the lowest vec_id with no distance. Distances are squared
    * euclidean via the fixed left fold over literal centers. */
  private def kcenterPicks(s: SparkSession, dir: String): Seq[(Long, Option[Double])] =
    kcenterCache.computeIfAbsent(AppCaches.key(s, dir, kcenterCache), { _ =>
      import s.implicits._
      val e = embs(s, dir).select($"vec_id", $"emb")
      def d2(c: Array[Double]): Column =
        (0 until EmbDim).map { i =>
          ($"emb".getItem(i) - lit(c(i))) * ($"emb".getItem(i) - lit(c(i)))
        }.reduce(_ + _)
      val seed = e.orderBy($"vec_id".asc).limit(1)
        .as[(Long, Seq[Double])].head()
      var centers = Vector((seed._1, seed._2.toArray, Option.empty[Double]))
      while (centers.size < KCenterK) {
        val nearest =
          if (centers.size == 1) d2(centers.head._2)
          else least(centers.map(c => d2(c._2)): _*)
        val next = e.filter(!$"vec_id".isin(centers.map(_._1): _*))
          .select($"vec_id", $"emb", nearest.as("dist"))
          .orderBy($"dist".desc, $"vec_id".asc).limit(1)
          .as[(Long, Seq[Double], Double)].head()
        centers = centers :+ ((next._1, next._2.toArray, Some(next._3)))
      }
      centers.map(c => (c._1, c._3))
    })

  /** Driver-side covariance stats (n, μ, Σ) derived from one coMoments
    * collect — MEMOIZED per (application, fixture dir): q140 and q150
    * both need them, and a 3-iteration bench would otherwise rerun the
    * identical 2080-row control-plane aggregation five extra times (the
    * q91 layout-memo lesson). The cache holds ~4 KB per fixture dir. */
  private val covStatsCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Array[Double], Array[Array[Double]])]

  private def covStats(s: SparkSession, dir: String): (Long, Array[Double], Array[Array[Double]]) =
    covStatsCache.computeIfAbsent(AppCaches.key(s, dir, covStatsCache), { _ =>
      val d = EmbDim
      val rows = coMoments(s, dir).collect()
      val sx = Array.ofDim[Double](d)
      val cov = Array.ofDim[Double](d, d)
      var n = 0L
      rows.foreach { r =>
        val i = r.getLong(0).toInt; val j = r.getLong(1).toInt
        n = r.getLong(2)
        if (i == j) sx(i) = r.getDouble(3)
        val c = (r.getDouble(5) - r.getDouble(3) * r.getDouble(4) / n) / (n - 1)
        cov(i)(j) = c; cov(j)(i) = c
      }
      (n, sx.map(_ / n), cov)
    })

  /** Upper-triangle co-moment aggregate over embeddings: one row per
    * (i ≤ j) dimension pair with n, Σxᵢ, Σxⱼ, Σxᵢxⱼ — covariance and
    * means derive from it (q139 output; q140/q150 via [[covStats]]). */
  private def coMoments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // spread before the ×2080 (i ≤ j) pair fan-out: fused into a
    // single-file scan the whole co-moment pass ran in one task (2.5 s);
    // no-op when the embedding scan is already parallel (Tables.spreadIfNarrow)
    Tables.spreadIfNarrow(embs(s, dir))
      .select(explode(expr(
        s"""flatten(transform(sequence(0, ${EmbDim - 1}), i ->
           |  transform(sequence(i, ${EmbDim - 1}), j ->
           |    named_struct('i', i, 'j', j, 'x', emb[i], 'y', emb[j]))))""".stripMargin)).as("p"))
      .select($"p.i".cast("long").as("i"), $"p.j".cast("long").as("j"), $"p.x", $"p.y")
      .groupBy($"i", $"j")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"))
  }

  // SRP-LSH geometry: signature width comes from the expression that
  // computes it (VectorFunctions.SrpBits — a single source of truth, so
  // widening the family there cannot desynchronize the band extraction
  // here); bands of SrpBandBits. 16 bits / 4-bit bands is the fixture
  // setting (the regime note on q54 applies: neighbors at cos 0.3–0.5
  // make banding recall modest here — measured in VectorSpec); production
  // corpora scale bits and bands, not the plan.
  private def SrpBits = VectorFunctions.SrpBits
  private val SrpBandBits = 4
  private val SrpThreshold = NearDupThreshold

  /** The md5-derived hyperplane family lives with the [[SrpSignature]]
    * expression (functions.VectorFunctions.srpUnit/srpPlanes); forwarded
    * here for the specs that probe the family directly. */
  private[graft] def srpUnit(b: Int, d: Int): Double =
    VectorFunctions.srpUnit(b, d)

  private def cosExpr(a: String, b: String): String =
    s"list_dot_product($a.emb, $b.emb) / " +
      s"(SQRT(list_dot_product($a.emb, $a.emb)) * SQRT(list_dot_product($b.emb, $b.emb)))"

  /** q130 oracle: PQ training + ADC search replayed arithmetic-for-
    * arithmetic. The 3 Lloyd rounds unroll with the SUBSPACE AS A COLUMN
    * (the q243 k-slice trick — the 16 subspaces never interact, so one
    * CTE chain trains them all): per round, sub-distances are
    * list_dot_product over the element-wise diff list (≡ PqEncode's
    * sequential diff²-accumulate), assignment is min-dist with ties to
    * the lowest codeword (PqEncode's strict <), and codeword updates are
    * e12 fixed-point member sums with COALESCE for empty cells. The ADC
    * phase mirrors the quantized LONG distance tables, the exact integer
    * shortlist ordering, and the cosine re-rank. */
  private def pqOracle(m: Int, k: Int, iters: Int, dsub: Int): String = {
    def diffList(vec: String, cwRef: String, mCol: String): String =
      s"[$vec[$mCol * $dsub + i] - $cwRef[i] for i in range(1, ${dsub + 1})]"
    val rounds = (1 to iters).map { r =>
      val prev = s"cb${r - 1}"
      s"""ds$r AS MATERIALIZED (
         |  SELECT v.vec_id, c.m, c.k,
         |    list_dot_product(${diffList("v.emb", "c.cw", "c.m")},
         |      ${diffList("v.emb", "c.cw", "c.m")}) AS dist
         |  FROM v CROSS JOIN $prev c),
         |en$r AS MATERIALIZED (
         |  SELECT d.vec_id, d.m, MIN(d.k) AS code
         |  FROM ds$r d JOIN (SELECT vec_id, m, MIN(dist) AS md
         |    FROM ds$r GROUP BY vec_id, m) x
         |    ON x.vec_id = d.vec_id AND x.m = d.m AND d.dist = x.md
         |  GROUP BY d.vec_id, d.m),
         |up$r AS MATERIALIZED (
         |  SELECT e2.m, e2.code AS k, t.i AS pos,
         |    SUM(CAST(FLOOR(v.emb[e2.m * $dsub + t.i] * 1e12) AS HUGEINT))
         |      AS sv,
         |    COUNT(*) AS n
         |  FROM en$r e2 JOIN v ON v.vec_id = e2.vec_id
         |  CROSS JOIN range(1, ${dsub + 1}) t(i)
         |  GROUP BY e2.m, e2.code, t.i),
         |cb$r AS MATERIALIZED (
         |  SELECT c.m, c.k, COALESCE(u.lst, c.cw) AS cw
         |  FROM $prev c LEFT JOIN (
         |    SELECT m, k, list((CAST(sv AS DOUBLE) / 1e12) / n
         |                      ORDER BY pos) AS lst
         |    FROM up$r GROUP BY m, k) u ON u.m = c.m AND u.k = c.k)"""
        .stripMargin
    }.mkString(",\n")
    val f = iters + 1
    s"""WITH v AS MATERIALIZED (
       |  SELECT vec_id, [x / nrm for x in emb] AS emb
       |  FROM (SELECT vec_id, emb, SQRT(list_dot_product(emb, emb)) AS nrm
       |        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
       |              FROM embeddings) e0) e1
       |  WHERE nrm > 0),
       |subs AS (SELECT CAST(mi AS INT) AS m FROM range(0, $m) t(mi)),
       |cb0 AS MATERIALIZED (
       |  SELECT s.m,
       |    ROW_NUMBER() OVER (PARTITION BY s.m ORDER BY q0.vec_id) - 1 AS k,
       |    q0.emb[s.m * $dsub + 1 : s.m * $dsub + $dsub] AS cw
       |  FROM (SELECT vec_id, emb FROM v ORDER BY vec_id LIMIT $k) q0
       |  CROSS JOIN subs s),
       |$rounds,
       |ds$f AS MATERIALIZED (
       |  SELECT v.vec_id, c.m, c.k,
       |    list_dot_product(${diffList("v.emb", "c.cw", "c.m")},
       |      ${diffList("v.emb", "c.cw", "c.m")}) AS dist
       |  FROM v CROSS JOIN cb$iters c),
       |en$f AS MATERIALIZED (
       |  SELECT d.vec_id, d.m, MIN(d.k) AS code
       |  FROM ds$f d JOIN (SELECT vec_id, m, MIN(dist) AS md
       |    FROM ds$f GROUP BY vec_id, m) x
       |    ON x.vec_id = d.vec_id AND x.m = d.m AND d.dist = x.md
       |  GROUP BY d.vec_id, d.m),
       |q AS MATERIALIZED (SELECT vec_id AS query_id, emb FROM v
       |  WHERE vec_id < $NumQueries),
       |dt AS MATERIALIZED (
       |  SELECT q.query_id, c.m, c.k,
       |    CAST(FLOOR(list_dot_product(${diffList("q.emb", "c.cw", "c.m")},
       |      ${diffList("q.emb", "c.cw", "c.m")}) * 1e12) AS BIGINT) AS qd
       |  FROM q CROSS JOIN cb$iters c),
       |ad AS MATERIALIZED (
       |  SELECT dt.query_id, e4.vec_id, CAST(SUM(dt.qd) AS BIGINT) AS adist
       |  FROM en$f e4 JOIN dt ON dt.m = e4.m AND dt.k = e4.code
       |  WHERE e4.vec_id <> dt.query_id
       |  GROUP BY dt.query_id, e4.vec_id),
       |sl AS (SELECT query_id, vec_id FROM (
       |  SELECT ad.*, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY adist, vec_id) AS rn FROM ad) WHERE rn <= $PqShortlist),
       |rr AS (SELECT sl.query_id, sl.vec_id,
       |    list_dot_product(a.emb, q.emb) /
       |      (SQRT(list_dot_product(a.emb, a.emb)) *
       |       SQRT(list_dot_product(q.emb, q.emb))) AS cos
       |  FROM sl JOIN v a ON a.vec_id = sl.vec_id
       |  JOIN q ON q.query_id = sl.query_id)
       |SELECT query_id, CAST(rk AS BIGINT) AS rk, vec_id AS neighbor_id,
       |  ROUND(cos, 6) AS cos_sim
       |FROM (SELECT rr.*, ROW_NUMBER() OVER (PARTITION BY query_id
       |  ORDER BY cos DESC, vec_id) AS rk FROM rr)
       |WHERE rk <= $TopK ORDER BY query_id, rk""".stripMargin
  }

  /** q153 oracle: the greedy MMR selection unrolled — MmrK materialized
    * rounds over the ROW_NUMBER-bounded candidate pool. Per round:
    * redundancy = MAX pairwise cosine against the picked set (order-free
    * max of identical doubles; COALESCE 0 for the empty set, matching
    * the Scala seed), score = λ·cos − (1−λ)·red with the same literal
    * arithmetic, pick = max-score row with ties to the lowest vec_id
    * (= the Scala argmax's comparison chain). Raw emission throughout. */
  private def mmrOracle(pool: Int, k: Int, lambda: String): String = {
    def pcos(a: String, b: String): String =
      s"list_dot_product($a.emb, $b.emb) / (SQRT(list_dot_product($a.emb, $a.emb))" +
        s" * SQRT(list_dot_product($b.emb, $b.emb)))"
    val rounds = (1 to k).map { r =>
      val prev = s"pk${r - 1}"
      s"""red$r AS MATERIALIZED (
         |  SELECT c.query_id, c.vec_id, c.cos, c.emb,
         |    COALESCE(MAX(${pcos("c", "s")}), 0.0) AS red
         |  FROM cand c LEFT JOIN $prev s ON s.query_id = c.query_id
         |  WHERE NOT EXISTS (SELECT 1 FROM $prev x
         |    WHERE x.query_id = c.query_id AND x.vec_id = c.vec_id)
         |  GROUP BY c.query_id, c.vec_id, c.cos, c.emb),
         |scr$r AS MATERIALIZED (
         |  SELECT query_id, vec_id, cos, emb,
         |    CAST($lambda AS DOUBLE) * cos -
         |      (CAST(1.0 AS DOUBLE) - CAST($lambda AS DOUBLE)) * red AS sc
         |  FROM red$r),
         |m$r AS (SELECT query_id, MAX(sc) AS ms FROM scr$r GROUP BY query_id),
         |pick$r AS MATERIALIZED (
         |  SELECT query_id, vec_id, cos, emb, sc FROM (
         |    SELECT s.*, ROW_NUMBER() OVER (PARTITION BY s.query_id
         |      ORDER BY s.vec_id) AS rn
         |    FROM scr$r s JOIN m$r m
         |      ON m.query_id = s.query_id AND s.sc = m.ms) WHERE rn = 1),
         |pk$r AS MATERIALIZED (
         |  SELECT * FROM $prev
         |  UNION ALL
         |  SELECT query_id, vec_id, cos, sc, CAST($r AS BIGINT) AS rnk, emb
         |  FROM pick$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |sc0 AS (
       |  SELECT q.vec_id AS query_id, a.vec_id AS vec_id,
       |    ${cosExpr("a", "q")} AS cos, a.emb
       |  FROM e a JOIN e q ON q.vec_id < $NumQueries AND a.vec_id <> q.vec_id),
       |cand AS MATERIALIZED (
       |  SELECT query_id, vec_id, cos, emb FROM (
       |    SELECT sc0.*, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, vec_id) AS rn FROM sc0) WHERE rn <= $pool),
       |pk0 AS (SELECT CAST(NULL AS BIGINT) AS query_id,
       |  CAST(NULL AS BIGINT) AS vec_id, CAST(NULL AS DOUBLE) AS cos,
       |  CAST(NULL AS DOUBLE) AS sc, CAST(NULL AS BIGINT) AS rnk,
       |  CAST(NULL AS DOUBLE[]) AS emb WHERE 1 = 0),
       |$rounds
       |SELECT query_id, rnk AS rank, vec_id,
       |  ROUND(cos, 6) + 0.0 AS cos_sim, ROUND(sc, 6) + 0.0 AS mmr_score
       |FROM pk$k ORDER BY query_id, rank""".stripMargin
  }

  /** q72 oracle: the Lloyd rounds unrolled (the q243/q157 convention —
    * replay the ARITHMETIC, not just the answer). Each round: score every
    * (vector, centroid) pair with the list_dot_product cosine (bit-parity
    * with the codegen'd CosineSimilarity), pick the max-cos cell (ties →
    * lowest id, = GroupTopK's (cos desc, cent_id asc)), then rebuild
    * centroids from e12-fixed-point sums of the unit-normalized members —
    * exactly KMeans.fit's update since r8. Empty cells keep the previous
    * centroid via the LEFT JOIN COALESCE. CTEs are MATERIALIZED (the q243
    * exponential-inline lesson). */
  private def kmeansOracle(k: Int, iters: Int): String = {
    def cosVC(c: String) =
      s"list_dot_product(v.emb, $c.ce) / (SQRT(list_dot_product(v.emb, v.emb))" +
        s" * SQRT(list_dot_product($c.ce, $c.ce)))"
    val rounds = (1 to iters).map { r =>
      val prev = s"cen${r - 1}"
      s"""sc$r AS MATERIALIZED (
         |  SELECT v.vec_id, c.cent_id, ${cosVC("c")} AS cs
         |  FROM v CROSS JOIN $prev c),
         |mx$r AS (SELECT vec_id, MAX(cs) AS m FROM sc$r GROUP BY vec_id),
         |asg$r AS MATERIALIZED (
         |  SELECT s.vec_id, MIN(s.cent_id) AS cell
         |  FROM sc$r s JOIN mx$r m ON m.vec_id = s.vec_id AND s.cs = m.m
         |  GROUP BY s.vec_id),
         |upd$r AS MATERIALIZED (
         |  SELECT a.cell, t.i AS pos,
         |    SUM(CAST(FLOOR(e.emb[t.i] / e.nrm * 1e12) AS HUGEINT)) AS sv,
         |    COUNT(*) AS n
         |  FROM asg$r a
         |  JOIN (SELECT vec_id, emb,
         |          SQRT(list_dot_product(emb, emb)) AS nrm FROM v) e
         |    ON e.vec_id = a.vec_id
         |  CROSS JOIN range(1, ${EmbDim + 1}) t(i)
         |  WHERE e.nrm > 0
         |  GROUP BY a.cell, t.i),
         |cen$r AS MATERIALIZED (
         |  SELECT c.cent_id, COALESCE(u.lst, c.ce) AS ce
         |  FROM $prev c LEFT JOIN (
         |    SELECT cell, list((CAST(sv AS DOUBLE) / 1e12) / n
         |                      ORDER BY pos) AS lst
         |    FROM upd$r GROUP BY cell) u ON u.cell = c.cent_id)""".stripMargin
    }.mkString(",\n")
    val f = iters + 1
    s"""WITH v AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |cen0 AS MATERIALIZED (
       |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cent_id, emb AS ce
       |  FROM (SELECT vec_id, emb FROM v ORDER BY vec_id LIMIT $k)),
       |$rounds,
       |sc$f AS MATERIALIZED (
       |  SELECT v.vec_id, c.cent_id, ${cosVC("c")} AS cs
       |  FROM v CROSS JOIN cen$iters c),
       |mx$f AS (SELECT vec_id, MAX(cs) AS m FROM sc$f GROUP BY vec_id),
       |asg$f AS MATERIALIZED (
       |  SELECT s.vec_id, MIN(s.cent_id) AS cell, MAX(s.cs) AS cs
       |  FROM sc$f s JOIN mx$f m ON m.vec_id = s.vec_id AND s.cs = m.m
       |  GROUP BY s.vec_id)
       |SELECT cell, COUNT(*) AS n_vectors,
       |  ROUND((CAST(SUM(CAST(FLOOR(cs * 1e12) AS HUGEINT)) AS DOUBLE) / 1e12)
       |    / COUNT(*), 6) AS avg_cos
       |FROM asg$f GROUP BY cell ORDER BY cell""".stripMargin
  }

  private lazy val annTopkOracle: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id, ${cosExpr("a", "q")} AS cos
       |  FROM e a JOIN e q ON q.vec_id < $NumQueries AND a.vec_id <> q.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
       |  FROM scored)
       |SELECT query_id, rk, neighbor_id, ROUND(cos, 6) AS cos_sim
       |FROM ranked WHERE rk <= $TopK ORDER BY query_id, rk""".stripMargin

  /** Double → DuckDB DOUBLE literal: plain decimal literals are DECIMAL
    * in DuckDB and would fold literal-literal arithmetic exactly in
    * decimal (ORACLE.md rule 6); suffixing `e0` forces the DOUBLE type
    * while `Double.toString`'s shortest-round-trip digits guarantee the
    * parsed value is bit-identical to the Scala double. */
  private def dlit(v: Double): String = {
    val s = v.toString
    if (s.contains("E") || s.contains("e")) s else s + "e0"
  }

  /** q140/q150 oracles — built at Verify-DUMP time (SparkEntry
    * .dynamicOracleSql) because they embed fixture-derived control-plane
    * literals: the covStats means and ops/Eigen's top-PcaK eigenvectors
    * (eigensolves aren't ANSI SQL). The memoized covStats collect is the
    * SAME object the Spark queries read in that JVM, so both engines
    * evaluate identical 64-term folds over bit-identical literals; the
    * oracle then independently re-runs the distributed projection /
    * reconstruction-audit arithmetic over the raw parquet. The eigensolve
    * itself stays gated by VectorSpec (orthonormality, trace, Rayleigh,
    * descending order, sign-fixed determinism). */
  def dynamicOracles(s: SparkSession, dir: String): Map[String, String] = {
    val d = EmbDim
    val (n, mu, cov) = covStats(s, dir)
    val (lam, vecs) = Eigen.symmetric(cov)
    // (emb[i] − μᵢ)·vᵢ summed left-to-right — the exact Column fold
    // q140/q150 build, so per-row values match bit-for-bit before ROUND.
    def proj(v: Array[Double]): String =
      (0 until d).map(i =>
        s"(emb[${i + 1}] - ${dlit(mu(i))}) * ${dlit(v(i))}").mkString(" + ")
    val centeredSq = (0 until d).map(i =>
      s"(emb[${i + 1}] - ${dlit(mu(i))}) * (emb[${i + 1}] - ${dlit(mu(i))})")
      .mkString(" + ")
    val q140 = {
      val pcs = (0 until PcaK).map(k =>
        s"ROUND(${proj(vecs(k))}, 6) + 0.0 AS pc$k").mkString(",\n  ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
         |           FROM embeddings)
         |SELECT vec_id,
         |  $pcs
         |FROM e ORDER BY vec_id""".stripMargin
    }
    val q275 = {
      val ws = (0 until PcaK).map { k =>
        val inv = 1.0 / math.sqrt(lam(k))
        s"ROUND((${proj(vecs(k))}) * ${dlit(inv)}, 6) + 0.0 AS w$k"
      }.mkString(",\n  ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
         |           FROM embeddings)
         |SELECT vec_id,
         |  $ws
         |FROM e ORDER BY vec_id""".stripMargin
    }
    val q150 = {
      val f = (n - 1).toDouble / n
      val folds = (0 until PcaK).map(k => s"(${proj(vecs(k))}) AS f$k")
        .mkString(",\n    ")
      val sqs = (0 until PcaK).map(k => s"f$k * f$k AS p$k").mkString(", ")
      val avgs = (0 until PcaK).map(k => s"AVG(p$k) AS a$k").mkString(", ")
      // measured: c2m − (a0 + … + a_{k−1}) — one subtraction after the
      // left-fold sum, matching the Scala emission; theory replays
      // f·Σ_{j>k}λⱼ over the interpolated eigenvalue literals in the
      // same fold order. Rounding pairs BigDecimal HALF_UP (Scala) with
      // DuckDB ROUND (half-up on DOUBLE) — the q153 convention.
      val rows = (1 to PcaK).map { k =>
        val msum = (0 until k).map(j => s"a$j").mkString(" + ")
        val tsum = lam.drop(k).map(dlit).mkString(" + ")
        s"""SELECT CAST($k AS BIGINT) AS k,
           |  ROUND(c2m - ($msum), 6) + 0.0 AS measured_mse,
           |  ROUND(${dlit(f)} * ($tsum), 6) + 0.0 AS theory_mse FROM a""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |p AS (
         |  SELECT ($centeredSq) AS c2,
         |    $folds
         |  FROM e),
         |q AS (SELECT c2, $sqs FROM p),
         |a AS (SELECT AVG(c2) AS c2m, $avgs FROM q)
         |$rows
         |ORDER BY k""".stripMargin
    }
    Map("q140_pca_project" -> q140, "q150_pca_reconstruction" -> q150,
      "q275_pca_whiten" -> q275)
  }

  val oracles: Map[String, String] = Map(
    // q270: the greedy unrolls as one CTE per round (the q72/q130
    // unrolled-iteration convention). Squared distance is
    // list_dot_product over the element-wise diff list — the same
    // sequential left fold as the Spark side's 64-term column reduce
    // (q130's PqEncode ≡ list_dot_product precedent) — so the argmax
    // compares bit-identical doubles and ties resolve on vec_id alike.
    "q270_kcenter_coreset" -> {
      def diff(x: String, c: String): String =
        s"[$x.emb[i] - $c.emb[i] for i in range(1, ${EmbDim + 1})]"
      def d2(x: String, c: String): String =
        s"list_dot_product(${diff(x, c)}, ${diff(x, c)})"
      val rounds = (2 to KCenterK).map { r =>
        val prev = (1 until r).map(i => s"p$i")
        val dist =
          if (prev.size == 1) d2("e", "p1")
          else s"LEAST(${prev.map(p => d2("e", p)).mkString(",\n         ")})"
        val excl = prev.map(p => s"e.vec_id <> $p.vec_id").mkString(" AND ")
        s"""p$r AS (
           |  SELECT e.vec_id, e.emb, $dist AS dist
           |  FROM e, ${prev.mkString(", ")}
           |  WHERE $excl
           |  ORDER BY dist DESC, e.vec_id ASC LIMIT 1)""".stripMargin
      }.mkString(",\n")
      val sel = (2 to KCenterK).map(r =>
        s"UNION ALL SELECT CAST($r AS BIGINT), vec_id, ROUND(dist, 6) + 0.0 FROM p$r")
        .mkString("\n")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
         |           FROM embeddings),
         |p1 AS (SELECT vec_id, emb FROM e ORDER BY vec_id LIMIT 1),
         |$rounds
         |SELECT CAST(1 AS BIGINT) AS pick_round, vec_id,
         |       CAST(NULL AS DOUBLE) AS sel_dist FROM p1
         |$sel
         |ORDER BY pick_round""".stripMargin
    },

    "q34_cosine_neardup" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |       ROUND(${cosExpr("a", "b")}, 6) AS cos_sim
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE ${cosExpr("a", "b")} >= $NearDupThreshold
         |ORDER BY vec_a, vec_b""".stripMargin,

    "q35_ann_topk" -> annTopkOracle,

    "q72_kmeans_cells" -> kmeansOracle(Cells, 3),

    "q153_mmr_diversify" -> mmrOracle(MmrPool, MmrK, "0.7"),

    "q130_ann_pq" -> pqOracle(PqM, Pq.K, 3, EmbDim / PqM),
    // The aggregate formulation must produce the identical result set.
    "q35b_ann_topk_agg" -> annTopkOracle,

    // Every stage of the IVF pipeline is deterministic (seed centroids,
    // argmax cell with ties to the lowest cent_id, top-Probes probe list,
    // exact re-rank) and every cosine is the bit-identical sequential
    // fold (q34/q35/q82 precedent) — so the inverted file, the probe set,
    // and the final ranking all replay exactly in SQL. Full oracle since
    // round 7 (previously rows-only with a recall gate, which VectorSpec
    // still keeps: recall is a property of the GEOMETRY, the oracle
    // proves the IMPLEMENTATION).
    "q54_ann_ivf" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |c AS (SELECT vec_id AS cent_id, emb AS c_emb FROM e WHERE vec_id < $Cells),
         |asg AS (
         |  SELECT vec_id, cent_id AS cell FROM (
         |    SELECT e.vec_id, c.cent_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
         |        list_dot_product(e.emb, c.c_emb) /
         |          (SQRT(list_dot_product(e.emb, e.emb)) * SQRT(list_dot_product(c.c_emb, c.c_emb))) DESC,
         |        c.cent_id) AS rk
         |    FROM e, c) t WHERE rk = 1),
         |q AS (SELECT vec_id AS query_id, emb AS q_emb FROM e WHERE vec_id < $NumQueries),
         |pr AS (
         |  SELECT query_id, q_emb, cent_id AS cell FROM (
         |    SELECT q.query_id, q.q_emb, c.cent_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
         |        list_dot_product(q.q_emb, c.c_emb) /
         |          (SQRT(list_dot_product(q.q_emb, q.q_emb)) * SQRT(list_dot_product(c.c_emb, c.c_emb))) DESC,
         |        c.cent_id) AS pk
         |    FROM q, c) t WHERE pk <= $Probes),
         |cand AS (
         |  SELECT pr.query_id, e.vec_id,
         |    list_dot_product(e.emb, pr.q_emb) /
         |      (SQRT(list_dot_product(e.emb, e.emb)) * SQRT(list_dot_product(pr.q_emb, pr.q_emb))) AS cos
         |  FROM asg JOIN pr ON asg.cell = pr.cell
         |  JOIN e ON e.vec_id = asg.vec_id
         |  WHERE asg.vec_id <> pr.query_id)
         |SELECT query_id, rk, vec_id AS neighbor_id, ROUND(cos, 6) AS cos_sim
         |FROM (SELECT query_id, vec_id, cos,
         |        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
         |      FROM cand) t
         |WHERE rk <= $TopK ORDER BY query_id, rk""".stripMargin,

    // Cell assignment (argmax cosine over the 16 seed centroids, ties to
    // the lowest cent_id) is replayed exactly: the raw cosine doubles are
    // bit-identical across engines (sequential-fold dot products, proven
    // by q35's rank ordering), so the ROW_NUMBER pick matches GroupTopK's.
    "q82_semdedup" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |c AS (SELECT vec_id AS cent_id, emb AS c_emb FROM e WHERE vec_id < $Cells),
         |sc AS (SELECT e.vec_id, c.cent_id,
         |         list_dot_product(e.emb, c.c_emb) /
         |           (SQRT(list_dot_product(e.emb, e.emb)) * SQRT(list_dot_product(c.c_emb, c.c_emb))) AS ccos
         |       FROM e, c),
         |asg AS (SELECT vec_id, cent_id AS cell FROM (
         |          SELECT vec_id, cent_id,
         |                 ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rk
         |          FROM sc) t WHERE rk = 1),
         |m AS (SELECT e.vec_id, e.emb, asg.cell FROM e JOIN asg USING (vec_id)),
         |dup AS (SELECT a.vec_id, MIN(b.vec_id) AS dup_of
         |        FROM m a JOIN m b ON a.cell = b.cell AND b.vec_id < a.vec_id
         |        WHERE list_dot_product(a.emb, b.emb) /
         |                (SQRT(list_dot_product(a.emb, a.emb)) * SQRT(list_dot_product(b.emb, b.emb))) >= 0.4
         |        GROUP BY a.vec_id)
         |SELECT m.vec_id, CAST(m.cell AS BIGINT) AS cell,
         |       CAST(CASE WHEN d.dup_of IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep,
         |       d.dup_of
         |FROM m LEFT JOIN dup d USING (vec_id) ORDER BY m.vec_id""".stripMargin,

    // No zip in DuckDB lambdas → index the two lists via comprehension.
    "q70_quantize_error" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |m AS (SELECT vec_id, emb,
        |        list_max(list_transform(emb, x -> abs(x))) AS max_abs FROM e),
        |s AS (SELECT vec_id, emb, CAST(127.0 AS DOUBLE) / max_abs AS scale
        |      FROM m WHERE max_abs > 0),
        |q AS (SELECT vec_id, emb, scale,
        |        list_transform(emb, x -> CAST(floor(x * scale) AS BIGINT)) AS qv FROM s),
        |d AS (SELECT vec_id, scale, qv,
        |        [(emb[i] - qv[i] / scale) * (emb[i] - qv[i] / scale) for i in range(1, len(emb) + 1)] AS err2,
        |        len(emb) AS dim
        |      FROM q)
        |SELECT vec_id, scale, list_min(qv) AS q_min, list_max(qv) AS q_max,
        |       ROUND(list_sum(err2) / dim, 6) AS mse
        |FROM d ORDER BY vec_id""".stripMargin,

    // DuckDB 1.0 has no UNNEST ... WITH ORDINALITY; zip index via list
    // comprehension instead.
    "q46_embedding_stats" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
        |SELECT vec_id, CAST(len(emb) AS BIGINT) AS dim,
        |       list_min(emb) AS amin, list_max(emb) AS amax,
        |       SQRT(list_dot_product(emb, emb)) AS l2_norm
        |FROM e ORDER BY vec_id""".stripMargin,

    "q36_label_centroids" ->
      """SELECT label, CAST(u.pos AS BIGINT) AS pos, COUNT(*) AS n,
        |       ROUND(SUM(CAST(u.v AS DOUBLE)) / COUNT(*), 6) AS mean_v
        |FROM (SELECT label,
        |        unnest([{'pos': i - 1, 'v': embedding[i]} for i in range(1, len(embedding) + 1)]) AS u
        |      FROM embeddings) t
        |GROUP BY label, pos ORDER BY label, pos""".stripMargin,

    // Reconstructs every hyperplane from md5 hex digit-wise (v is an exact
    // BIGINT, v/2³¹ − 1 exact dyadic steps — identical doubles to Scala's
    // srpUnit), replays projections with list_dot_product (the same
    // sequential fold as the Spark HOF — q34/q35 precedent), and takes the
    // banded candidate set exhaustively. A hash match therefore re-proves
    // signature, banding, and verification end-to-end on every run.
    "q121_srp_lsh" -> {
      val v = (0 until 8)
        .map(i => s"(strpos('0123456789abcdef', substr(h, ${i + 1}, 1)) - 1) * (1::BIGINT << ${4 * (7 - i)})")
        .mkString(" +\n        |        ")
      s"""WITH hd AS (
         |  SELECT b, d,
         |    md5('srp' || CAST(b AS VARCHAR) || ':' || CAST(d AS VARCHAR)) AS h
         |  FROM range(0, ${VectorFunctions.SrpBits}) t1(b), range(0, ${VectorFunctions.SrpDim}) t2(d)),
         |hu AS (
         |  SELECT b, d,
         |    CAST($v AS DOUBLE) / 2147483648.0 - 1.0 AS u
         |  FROM hd),
         |hp AS (SELECT b, list(u ORDER BY d) AS hv FROM hu GROUP BY b),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |bits AS (
         |  SELECT vec_id, b,
         |    CASE WHEN list_dot_product(emb, hv) >= 0 THEN 1 ELSE 0 END AS bit
         |  FROM e CROSS JOIN hp),
         |bands AS (
         |  SELECT vec_id, b // $SrpBandBits AS band,
         |    CAST(SUM(bit * (1 << ($SrpBandBits - 1 - (b % $SrpBandBits)))) AS BIGINT) AS bv
         |  FROM bits GROUP BY vec_id, b // $SrpBandBits),
         |cand AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, COUNT(*) AS n_bands
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bv = b.bv AND a.vec_id < b.vec_id
         |  GROUP BY a.vec_id, b.vec_id)
         |SELECT c.vec_a, c.vec_b, c.n_bands, ROUND(${cosExpr("a", "b")}, 6) AS cos_sim
         |FROM cand c
         |JOIN e a ON a.vec_id = c.vec_a
         |JOIN e b ON b.vec_id = c.vec_b
         |WHERE ${cosExpr("a", "b")} >= $SrpThreshold
         |ORDER BY c.vec_a, c.vec_b""".stripMargin
    },

    // Same hyperplane/band spine as q121's oracle; asymmetric candidate
    // pairs, label-mismatch filter, ROW_NUMBER replays GroupTopK's
    // (cos DESC, cand) order.
    "q207_hard_negatives" -> {
      val v = (0 until 8)
        .map(i => s"(strpos('0123456789abcdef', substr(h, ${i + 1}, 1)) - 1) * (1::BIGINT << ${4 * (7 - i)})")
        .mkString(" +\n        |        ")
      s"""WITH hd AS (
         |  SELECT b, d,
         |    md5('srp' || CAST(b AS VARCHAR) || ':' || CAST(d AS VARCHAR)) AS h
         |  FROM range(0, ${VectorFunctions.SrpBits}) t1(b), range(0, ${VectorFunctions.SrpDim}) t2(d)),
         |hu AS (
         |  SELECT b, d,
         |    CAST($v AS DOUBLE) / 2147483648.0 - 1.0 AS u
         |  FROM hd),
         |hp AS (SELECT b, list(u ORDER BY d) AS hv FROM hu GROUP BY b),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label
         |      FROM embeddings),
         |bits AS (
         |  SELECT vec_id, b,
         |    CASE WHEN list_dot_product(emb, hv) >= 0 THEN 1 ELSE 0 END AS bit
         |  FROM e CROSS JOIN hp),
         |bands AS (
         |  SELECT vec_id, b // $SrpBandBits AS band,
         |    CAST(SUM(bit * (1 << ($SrpBandBits - 1 - (b % $SrpBandBits)))) AS BIGINT) AS bv
         |  FROM bits GROUP BY vec_id, b // $SrpBandBits),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS anchor, b.vec_id AS cand
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bv = b.bv AND a.vec_id <> b.vec_id),
         |sc AS (
         |  SELECT c.anchor, c.cand, eb.label AS neg_label,
         |    ${cosExpr("ea", "eb")} AS cos
         |  FROM cand c
         |  JOIN e ea ON ea.vec_id = c.anchor
         |  JOIN e eb ON eb.vec_id = c.cand
         |  WHERE ea.label <> eb.label),
         |rk AS (
         |  SELECT anchor, cand, neg_label, cos,
         |    ROW_NUMBER() OVER (PARTITION BY anchor ORDER BY cos DESC, cand) AS r
         |  FROM sc)
         |SELECT anchor AS vec_id, cand AS neg_id, neg_label,
         |  ROUND(cos, 6) AS cos_sim
         |FROM rk WHERE r <= 3 ORDER BY vec_id, neg_id""".stripMargin
    },

    // Norm factors in the same order as CosineSimilarity's loop
    // (sqrt(t·t)·sqrt(v·v)); the ROW_NUMBER tiebreak replays GroupTopK's
    // (cos DESC, train_id) order.
    "q123_embed_leakage" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         |         substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) AS h
         |  FROM embeddings),
         |tr AS (SELECT vec_id AS train_id, emb AS t_emb FROM e
         |       WHERE h <= '9' OR h = 'a' OR h = 'b'),
         |v AS (SELECT vec_id AS val_id, emb AS v_emb FROM e
         |      WHERE h = 'c' OR h = 'd'),
         |sc AS (
         |  SELECT val_id, train_id,
         |    list_dot_product(t_emb, v_emb) /
         |      (SQRT(list_dot_product(t_emb, t_emb)) * SQRT(list_dot_product(v_emb, v_emb))) AS cos
         |  FROM tr CROSS JOIN v),
         |rk AS (
         |  SELECT val_id, train_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY val_id ORDER BY cos DESC, train_id) AS r
         |  FROM sc)
         |SELECT val_id AS vec_id, train_id AS nearest_train_id,
         |  ROUND(cos, 6) AS cos_sim, cos >= $SemDedupThreshold AS leaked
         |FROM rk WHERE r = 1 ORDER BY vec_id""".stripMargin,

    // Same co-moment algebra; DuckDB expands the (i ≤ j) pair grid with
    // range() (BIGINT, matching the Spark side's long cast) and indexes
    // the 1-based list.
    "q139_embedding_covariance" ->
      s"""WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |p AS (
         |  SELECT i.i AS i, j.j AS j, emb[i.i + 1] AS x, emb[j.j + 1] AS y
         |  FROM e, range(0, $EmbDim) i(i), range(0, $EmbDim) j(j)
         |  WHERE j.j >= i.i)
         |SELECT i, j, COUNT(*) AS n,
         |  ROUND((SUM(x * y) - SUM(x) * SUM(y) / COUNT(*)) / (COUNT(*) - 1), 6) + 0.0 AS cov
         |FROM p GROUP BY i, j ORDER BY i, j""".stripMargin,

    // Centroids rebuilt via unnest+AVG and reassembled with an ordered
    // list(); distances replay the cosExpr fold order.
    "q142_label_silhouette" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |x AS (
         |  SELECT label, i.i AS i, AVG(emb[i.i]) AS c
         |  FROM e, range(1, ${EmbDim + 1}) i(i) GROUP BY label, i.i),
         |cent AS (SELECT label AS clabel, list(c ORDER BY i) AS cent FROM x GROUP BY label),
         |sc AS (
         |  SELECT e.vec_id, e.label, c.clabel,
         |    1 - list_dot_product(e.emb, c.cent) /
         |      (SQRT(list_dot_product(e.emb, e.emb)) * SQRT(list_dot_product(c.cent, c.cent))) AS dist
         |  FROM e CROSS JOIN cent c),
         |ab AS (
         |  SELECT vec_id, label,
         |    MIN(CASE WHEN clabel = label THEN dist END) AS a,
         |    MIN(CASE WHEN clabel <> label THEN dist END) AS b
         |  FROM sc GROUP BY vec_id, label)
         |SELECT label, COUNT(*) AS n_vecs,
         |  ROUND(AVG((b - a) / GREATEST(a, b)), 6) AS avg_silhouette
         |FROM ab GROUP BY label ORDER BY label""".stripMargin
  )
}
