package graft.operators

/** Driver-side eigen machinery for PCA over embedding covariance.
  *
  * Scale split: the CORPUS pass is the distributed one-shot
  * [[graft.functions.VectorMomentsAgg]] (fixed 17 KB state at d=64);
  * only the d×d covariance matrix ever reaches the driver, and the
  * cyclic-Jacobi eigendecomposition below is O(d³) on a 64×64 matrix —
  * microseconds, independent of corpus size. This is the standard
  * big-data PCA factorization (sufficient statistics → small dense
  * eigenproblem), not a driver-side shortcut.
  */
object Pca {

  /** Population covariance matrix from a [[graft.functions.VectorMomentsAgg]]
    * buffer `[n, a…, Σu…, Σuuᵀ upper-tri…]` (u = x − a, a the buffer's
    * data anchor). cov(i,j) = Σuv/n − (Σu/n)(Σv/n) subtracts terms of the
    * covariance's OWN magnitude — no μ²-scale cancellation however large
    * the corpus mean (the round-6 embed_covariance failure mode).
    */
  def covariance(m: Array[Double], d: Int): Array[Array[Double]] = {
    import graft.functions.VectorMomentsAgg.{triBase, triIndex}
    val n = m(0)
    require(n > 0, "covariance of an empty corpus")
    val base = triBase(d)
    val c = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val cov = m(base + triIndex(d, i, j)) / n -
          (m(1 + d + i) / n) * (m(1 + d + j) / n)
        c(i)(j) = cov
        c(j)(i) = cov
        j += 1
      }
      i += 1
    }
    c
  }

  /** Cyclic-Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvectors-as-rows), sorted by eigenvalue
    * descending with a deterministic tie/sign normalization (each
    * vector's largest-|component| entry is made positive; ties in the
    * eigenvalue order break on the first differing vector component).
    * Converges quadratically; the sweep loop stops when the off-diagonal
    * Frobenius mass falls below 1e-14 of the total.
    */
  def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)

    def offDiag(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    val total = math.max(a0.map(r => r.map(x => x * x).sum).sum, Double.MinPositiveValue)

    // both sides are SQUARED mass: 1e-28·total ⇒ off-diagonal entries at
    // ~1e-14 of the matrix scale (quadratic convergence makes the extra
    // sweeps cheap)
    var sweep = 0
    while (offDiag() > 1e-28 * total && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // |theta| huge ⇒ theta² overflows to Inf and the quotient
            // underflows to ±0.0, which the 45°-rotation branch below
            // would misread as theta == 0; the correct tiny rotation is
            // t ≈ 1/(2θ)
            val t =
              if (math.abs(theta) > 1e150) 1.0 / (2.0 * theta)
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 // theta == 0 → 45° rotation
                case x   => x
              }
            val c  = 1.0 / math.sqrt(t * t + 1.0)
            val s  = t * c
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
              k += 1
            }
            k = 0
            while (k < d) {
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

    // columns of v are eigenvectors; sort desc by eigenvalue, normalize sign
    val pairs = (0 until d).map { j =>
      val vec = Array.tabulate(d)(i => v(i)(j))
      var best = 0
      var i = 1
      while (i < d) { if (math.abs(vec(i)) > math.abs(vec(best))) best = i; i += 1 }
      if (vec(best) < 0) { i = 0; while (i < d) { vec(i) = -vec(i); i += 1 } }
      (a(j)(j), vec)
    }
    val sorted = pairs.sortWith { case ((l1, v1), (l2, v2)) =>
      if (l1 != l2) l1 > l2
      else v1.indices.find(i => v1(i) != v2(i)).exists(i => v1(i) < v2(i))
    }
    (sorted.map(_._1).toArray, sorted.map(_._2).toArray)
  }
}
