package graft.operators

import graft.SparkSpec

/** PCA machinery: Jacobi eigensolver invariants (A·v = λv, orthonormal
  * basis, Σλ = trace), the planted-spectrum fixture through the full
  * embed_pca_topk query, and covariance cross-checks against the
  * independently-computed per-dimension variances.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  // --- jacobiEigen on a fixed symmetric matrix ------------------------

  private def fixedSymmetric(d: Int): Array[Array[Double]] = {
    // deterministic, well-conditioned: a_ij = 1/(i+j+1) (Hilbert-like) + d·I
    Array.tabulate(d, d)((i, j) => 1.0 / (i + j + 1) + (if (i == j) d else 0))
  }

  test("jacobiEigen: A·v = λv, basis orthonormal, eigenvalues sum to trace") {
    val d = 6
    val a = fixedSymmetric(d)
    val (ev, vecs) = Pca.jacobiEigen(a)
    // sorted descending
    ev.sliding(2).foreach(p => assert(p(0) >= p(1) - 1e-12))
    // Σλ = trace
    val trace = (0 until d).map(i => a(i)(i)).sum
    assert(math.abs(ev.sum - trace) < 1e-9)
    // residuals + orthonormality
    for (c <- 0 until d) {
      val v = vecs(c)
      val av = Array.tabulate(d)(i => (0 until d).map(j => a(i)(j) * v(j)).sum)
      for (i <- 0 until d) assert(math.abs(av(i) - ev(c) * v(i)) < 1e-8, s"residual c=$c i=$i")
      for (c2 <- 0 until d) {
        val dot = (0 until d).map(i => v(i) * vecs(c2)(i)).sum
        assert(math.abs(dot - (if (c == c2) 1.0 else 0.0)) < 1e-9, s"ortho $c,$c2")
      }
    }
  }

  test("jacobiEigen: near-annihilated off-diagonal entry takes the tiny-rotation path") {
    // theta = (2−1)/(2·1e-200) ≈ 5e199: theta² overflows to Inf and the
    // naive quotient underflows to ±0.0 — the regression misread that as
    // "theta == 0" and applied a 45° rotation to an almost-diagonal
    // matrix; the guarded path rotates by t ≈ 1/(2θ) ≈ 0
    val (ev, _) = Pca.jacobiEigen(Array(Array(1.0, 1e-200), Array(1e-200, 2.0)))
    assert(math.abs(ev(0) - 2.0) < 1e-12 && math.abs(ev(1) - 1.0) < 1e-12)
  }

  test("jacobiEigen: known 2x2 spectrum") {
    // [[2,1],[1,2]] → λ = 3 (v ∝ (1,1)) and 1 (v ∝ (1,−1))
    val (ev, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(ev(0) - 3.0) < 1e-12 && math.abs(ev(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2.0)
    assert(math.abs(vecs(0)(0) - r) < 1e-9 && math.abs(vecs(0)(1) - r) < 1e-9)
    // sign normalization: largest-|component| entry positive
    assert(vecs(1).exists(x => math.abs(x - r) < 1e-9))
  }

  // --- planted spectrum through the full queries ----------------------

  private def plantedDir(): String = {
    // 64-dim vectors: ±3 on dim 0, ±1 on dim 1 → cov = diag(4.5, 0.5, 0…)
    def unit(dim: Int, scale: Float): Array[Float] =
      Array.tabulate(64)(i => if (i == dim) scale else 0.0f)
    val rows = Seq(
      (0L, unit(0, 3.0f), 0), (1L, unit(0, -3.0f), 0),
      (2L, unit(1, 1.0f), 0), (3L, unit(1, -1.0f), 0))
    val tmp = java.nio.file.Files.createTempDirectory("pca").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  test("embed_pca_topk: planted diagonal spectrum is recovered exactly") {
    val out = graft.queries.EmbedQueries.pcaTopkFrame(spark, plantedDir())
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4), r.getDouble(5)))
      .toMap
    assert(out(1L) == ((4.5, 0.9, 0.9, 0L, 1.0)))
    assert(out(2L) == ((0.5, 0.1, 1.0, 1L, 1.0)))
    // null-space components report zero eigenvalue and zero explained mass
    (3L to 8L).foreach { c =>
      assert(math.abs(out(c)._1) < 1e-12 && out(c)._3 == 1.0)
    }
  }

  test("embed_covariance: planted entries, symmetry-free upper triangle, row count") {
    val rows = graft.SparkEntry.queries("embed_covariance")(spark, plantedDir())
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(rows.size == 64 * 65 / 2)
    assert(math.abs(rows((0L, 0L)) - 4.5) < 1e-12)
    assert(math.abs(rows((1L, 1L)) - 0.5) < 1e-12)
    assert(math.abs(rows((0L, 1L))) < 1e-12)
    assert(math.abs(rows((5L, 9L))) < 1e-12)
    rows.keys.foreach { case (i, j) => assert(i <= j) }
  }

  test("embed_pca_project: planted in-span vectors reconstruct exactly") {
    val rows = graft.queries.EmbedQueries.pcaProjectFrame(spark, plantedDir())
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(6)) < 1e-9, s"k4 err for vec ${r.getLong(0)}")
      assert(math.abs(r.getDouble(7)) < 1e-9, s"k8 err for vec ${r.getLong(0)}")
    }
    val byId = rows.map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    def close(a: (Double, Double), b: (Double, Double)) =
      math.abs(a._1 - b._1) < 1e-9 && math.abs(a._2 - b._2) < 1e-9
    assert(close(byId(0L), (3.0, 0.0)) && close(byId(1L), (-3.0, 0.0)))
    assert(close(byId(2L), (0.0, 1.0)) && close(byId(3L), (0.0, -1.0)))
  }

  test("embed_pca_project: real data — error shrinks with k, mean pc² is the eigenvalue") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.queries.EmbedQueries.pcaProjectFrame(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (e4, e8) = (r.getDouble(6), r.getDouble(7))
      assert(e4 >= 0 && e8 >= 0 && e8 <= e4 + 1e-6, s"vec ${r.getLong(0)}: $e8 > $e4")
    }
    // population mean of the first principal coordinate squared = λ₁
    val lambda1 = graft.queries.EmbedQueries.pcaTopkFrame(spark, sf)
      .collect().find(_.getLong(0) == 1L).get.getDouble(1)
    val meanSq = rows.map(r => math.pow(r.getDouble(2), 2)).sum / rows.length
    assert(math.abs(meanSq - lambda1) < 1e-3 * math.max(1.0, lambda1),
      s"mean pc1² $meanSq vs λ₁ $lambda1")
  }

  test("embed_covariance diagonal equals embed_dim_variance on real data") {
    val sf = "/root/testdata/sf0.001"
    val diag = graft.SparkEntry.queries("embed_covariance")(spark, sf)
      .collect().collect { case r if r.getLong(0) == r.getLong(1) =>
        r.getLong(0) -> r.getDouble(2) }.toMap
    val vars = graft.SparkEntry.queries("embed_dim_variance")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(diag.size == 64 && vars.size == 64)
    // both sides round to 6 dp; a knife-edge boundary can differ by one ulp
    // of that grid at most
    diag.foreach { case (i, c) =>
      assert(math.abs(c - vars(i)) < 1.5e-6, s"dim $i: $c vs ${vars(i)}")
    }
  }

  test("embed_whiten_check: whitened covariance is the identity on real data") {
    val Some((n, kept, off, diag)) =
      graft.queries.EmbedQueries.whitenDiagnostics(spark, "/root/testdata/sf0.001")
    assert(n > 0 && kept > 0, "no components kept")
    assert(off < 1e-6 && diag < 1e-6,
      s"whitening failed: offdiag $off, diagerr $diag")
    // the certificate query mirrors the diagnostics
    val r = graft.SparkEntry.queries("embed_whiten_check")(
      spark, "/root/testdata/sf0.001").collect()(0)
    assert(r.getLong(0) == n && r.getBoolean(1))
  }

  test("certificate queries: every invariant boolean is true on real data") {
    val sf = "/root/testdata/sf0.001"
    val topk = graft.SparkEntry.queries("embed_pca_topk")(spark, sf).collect()
    assert(topk.length == 8)
    topk.foreach { r =>
      (1 to 6).foreach(i => assert(r.getBoolean(i), s"component ${r.getLong(0)} col $i"))
    }
    val proj = graft.SparkEntry.queries("embed_pca_project")(spark, sf).collect()
    assert(proj.nonEmpty)
    proj.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3), s"vec ${r.getLong(0)}")
    }
  }

  test("embed_covariance: empty embeddings table yields zero rows, not NaN") {
    val tmp = java.nio.file.Files.createTempDirectory("pcaempty").toString
    Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    assert(graft.SparkEntry.queries("embed_covariance")(spark, tmp).count() == 0L)
  }

  test("vector_moments: μ=10⁶/σ=10⁻³ corpus — anchored moments match two-pass covar_pop far inside 6 dp") {
    import graft.functions.VectorMomentsAgg.vector_moments
    import org.apache.spark.sql.functions.col
    // the round-6 failure mode: raw moments subtract two O(μ²)=1e12 terms
    // to recover an O(σ²)=1e-7 covariance — double eps at 1e12 is ~2e-4,
    // five orders above the signal. Anchored accumulation keeps every
    // term at σ scale; repartition(8) forces merges across buffers with
    // DIFFERENT data anchors so the shift identity is exercised too.
    val d   = 4
    val rng = new scala.util.Random(7)
    val data = Seq.fill(64)(Array.fill(d)(1e6 + (rng.nextDouble() - 0.5) * 1e-3))
    val m = data.map(Tuple1(_)).toDF("embedding").repartition(8)
      .agg(vector_moments(col("embedding"), d)).head.getSeq[Double](0).toArray
    val cov = Pca.covariance(m, d)
    // exact two-pass reference — the same centered co-moment DuckDB's
    // covar_pop computes for the embed_covariance oracle
    val n  = data.length.toDouble
    val mu = Array.tabulate(d)(i => data.map(_(i)).sum / n)
    for (i <- 0 until d; j <- 0 until d) {
      val ref = data.map(x => (x(i) - mu(i)) * (x(j) - mu(j))).sum / n
      assert(math.abs(cov(i)(j) - ref) < 1e-12,
        s"cov($i,$j) ${cov(i)(j)} vs two-pass $ref")
    }
    val mhat = graft.functions.VectorMomentsAgg.mean(m, d)
    for (i <- 0 until d)
      assert(math.abs(mhat(i) - mu(i)) < 1e-9, s"mean($i) ${mhat(i)} vs ${mu(i)}")
  }

  test("embed_pca_project: |μ|≫σ corpus — energy certificate survives the cancellation regime") {
    // μ=10³ per dim, σ=10⁻¹ (float32-representable: eps(10³)≈6e-5 ≪ σ).
    // The retired uncentered form computed ‖x−μ‖² as x·x − 2x·μ + μ·μ with
    // ‖x‖² ≈ 64·10⁶, so its eps·‖x‖² cancellation error rivaled the whole
    // 1e-6·cn2 tolerance and could flip energy_full_ok with no engine bug;
    // the center-first form keeps every term at σ scale.
    val d   = 64
    val rng = new scala.util.Random(11)
    val rows = (0L until 50L).map { id =>
      (id, Array.fill(d)((1e3 + (rng.nextDouble() - 0.5) * 0.2).toFloat), (id % 3).toInt)
    }
    val tmp = java.nio.file.Files.createTempDirectory("pcashift").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val proj = graft.SparkEntry.queries("embed_pca_project")(spark, tmp).collect()
    assert(proj.length == 50)
    proj.foreach { r =>
      assert(r.getBoolean(2), s"energy_full_ok flipped for vec ${r.getLong(0)}")
      assert(r.getBoolean(3), s"energy_topk_ok flipped for vec ${r.getLong(0)}")
    }
  }

  test("vector_moments: a null vector element fails fast instead of counting as 0") {
    import graft.functions.VectorMomentsAgg.vector_moments
    val df = Seq(Tuple1(Array[java.lang.Float](1.0f, null, 3.0f)))
      .toDF("embedding")
    val e = intercept[Throwable] {
      df.agg(vector_moments(org.apache.spark.sql.functions.col("embedding"), 3)).head
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: messages(x.getCause))
    assert(messages(e).exists(_.contains("null element")))
  }
}
