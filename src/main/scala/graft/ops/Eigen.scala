package graft.ops

/**
 * Driver-side symmetric eigensolver (cyclic Jacobi) for PCA over the
 * embedding covariance matrix.
 *
 * Scale rationale: the DATA never comes here. The covariance of a d-dim
 * embedding corpus is a d×d control-plane object (d = 64 → 4 KB of
 * doubles) produced by one distributed aggregation whose shuffle carries
 * only d(d+1)/2 group rows (see q139); eigendecomposing it on the driver
 * is the same control-plane pattern as collecting k-means centroids
 * (ops/KMeans.scala) — O(d³) ≈ 260k flops, independent of corpus size.
 * A 1000-executor cluster reading 100 TB still hands the driver the same
 * 64×64 matrix.
 *
 * Classic cyclic Jacobi (Golub & Van Loan §8.5): repeatedly rotate away
 * the largest-magnitude off-diagonal entries until the off-diagonal
 * Frobenius mass is ~0. Deterministic: fixed sweep order, fixed rotation
 * formulas, no randomness — the same input matrix yields bit-identical
 * eigenpairs on every run, which the q140 output contract relies on.
 */
object Eigen {

  /** Eigen-decompose a symmetric d×d matrix. Returns (eigenvalues,
    * eigenvectors) sorted by eigenvalue DESCENDING; eigenvectors are rows
    * of the returned matrix (vecs(k) is the k-th unit eigenvector), each
    * sign-fixed so its largest-|component| entry is positive (first such
    * index wins), removing the ±v ambiguity that would otherwise make
    * output hashes run-dependent.
    */
  def symmetric(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)

    def off(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }

    var sweep = 0
    // 64×64 covariance converges in ~8 sweeps; 50 is a hard safety bound.
    while (sweep < 50 && off() > 1e-22) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            // Rotation angle from the standard stable formulas.
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case s0  => s0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }

    val pairs = (0 until d).map { k =>
      val vec = Array.tabulate(d)(i => v(i)(k))
      // Sign fix: largest-|component| entry positive (ties → first index).
      var best = 0
      var i = 1
      while (i < d) { if (math.abs(vec(i)) > math.abs(vec(best))) best = i; i += 1 }
      val s = if (vec(best) < 0) -1.0 else 1.0
      (a(k)(k), vec.map(_ * s))
    }.sortBy(-_._1)

    (pairs.map(_._1).toArray, pairs.map(_._2).toArray)
  }
}
