package graft.queries

import graft.SparkSpec

/** Rotated product quantization: the PCA rotation must preserve L2
  * geometry exactly (orthonormal basis), and the rotated quantizer should
  * never be materially worse than raw PQ — on the driver testdata it is
  * strictly better (sf0.01: mean recall 0.25 vs 0.17).
  */
class OpqSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  test("rotation preserves pairwise L2 distances (via Pca primitives)") {
    import graft.functions.VectorMomentsAgg.vector_moments
    import org.apache.spark.sql.functions.col
    val e = graft.core.Graft.embeddings(spark, Sf)
    val m = e.agg(vector_moments(col("embedding"), 64))
      .head.getSeq[Double](0).toArray
    val (_, vecs) = {
      val cov = graft.operators.Pca.covariance(m, 64)
      graft.operators.Pca.jacobiEigen(cov)
    }
    val sample = e.limit(6).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    def rot(x: Array[Double]): Array[Double] =
      vecs.map(v => v.zip(x).map { case (a, b) => a * b }.sum)
    def dist(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    for (i <- sample.indices; j <- i + 1 until sample.length) {
      val raw = dist(sample(i), sample(j))
      val rtd = dist(rot(sample(i)), rot(sample(j)))
      assert(math.abs(raw - rtd) < 1e-9 * math.max(1.0, raw), s"pair ($i,$j)")
    }
  }

  test("opq ranking: well-formed rows, recall at least PQ's minus slack") {
    val opq = graft.queries.EmbedQueries.opqKnnFrame(spark, Sf).collect()
    assert(opq.nonEmpty)
    opq.foreach { r =>
      assert(r.getDouble(2) >= 0.0, "ADC distance must be non-negative")
      assert(r.getLong(3) >= 1L && r.getLong(3) <= 5L)
    }
    val ro = {
      val rows = graft.queries.EmbedQueries.opqRecallFrame(spark, Sf).collect()
      rows.map(_.getDouble(1)).sum / rows.length
    }
    val rp = {
      val rows = graft.SparkEntry.queries("embed_pq_recall")(spark, Sf).collect()
      rows.map(_.getDouble(1)).sum / rows.length
    }
    // regression guard on this fixture, not a theorem: the PCA rotation
    // has beaten raw PQ on every driver vintage observed (0.25 vs 0.17
    // at sf0.01); allow small-sample slack
    assert(ro >= rp - 0.05, s"opq recall $ro collapsed below pq recall $rp")
  }

  test("opq certificate queries: every boolean true, neighbor counts exact") {
    val knn = graft.SparkEntry.queries("embed_opq_knn")(spark, Sf).collect()
    assert(knn.nonEmpty)
    knn.foreach { r =>
      assert(r.getLong(1) == 5L, s"query ${r.getLong(0)}: ${r.getLong(1)} neighbors")
      assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4),
        s"query ${r.getLong(0)} certificate failed")
    }
    val rec = graft.SparkEntry.queries("embed_opq_recall")(spark, Sf).collect()
    assert(rec.nonEmpty)
    rec.foreach(r => assert(r.getBoolean(1)))
  }
}
