package graft.queries

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import graft.SparkSpec

/** Matryoshka truncated-dimension search vs an independent Scala model:
  * the truncated ranking must equal brute-force cosine over the first 32
  * dims, and the recall query must equal the overlap of the two model
  * rankings — not the query's own plan.
  */
class MatryoshkaSpec extends SparkSpec {
  import spark.implicits._

  private val Sf = "/root/testdata/sf0.001"
  private val K  = 5

  private def round6(d: Double): Double =
    JBigDecimal.valueOf(d).setScale(6, RoundingMode.HALF_UP).doubleValue

  private def topK(vecs: Map[Long, Array[Double]]): Map[Long, Seq[Long]] = {
    val norms = vecs.map { case (id, v) => id -> math.sqrt(v.map(x => x * x).sum) }
    (0L until 20L).map { q =>
      val qv = vecs(q)
      val scored = vecs.collect { case (id, v) if id != q =>
        val cos = round6(qv.zip(v).map { case (a, b) => a * b }.sum / (norms(q) * norms(id)))
        (id, cos)
      }.toSeq
      q -> scored.sortBy { case (id, c) => (-c, id) }.take(K).map(_._1)
    }.toMap
  }

  private lazy val vecs: Map[Long, Array[Double]] =
    graft.core.Graft.embeddings(spark, Sf)
      .select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().map { case (id, v) => id -> v.map(_.toDouble) }.toMap

  test("embed_matryoshka_knn equals brute-force cosine over the first 32 dims") {
    val expected = topK(vecs.map { case (id, v) => id -> v.take(32) })
    val got = graft.SparkEntry.queries("embed_matryoshka_knn")(spark, Sf)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._3).map(_._2).toSeq }
    assert(got == expected)
  }

  test("embed_mrl_rerank_knn equals shortlist-then-full-rank on the model") {
    val norms  = vecs.map { case (id, v) => id -> math.sqrt(v.map(x => x * x).sum) }
    val shortV = vecs.map { case (id, v) => id -> v.take(32) }
    val shortN = shortV.map { case (id, v) => id -> math.sqrt(v.map(x => x * x).sum) }
    def cos(a: Long, b: Long, vs: Map[Long, Array[Double]], ns: Map[Long, Double]) =
      round6(vs(a).zip(vs(b)).map { case (x, y) => x * y }.sum / (ns(a) * ns(b)))
    val expected = (0L until 20L).map { q =>
      val pool = vecs.keys.filter(_ != q).toSeq
        .map(id => (id, cos(q, id, shortV, shortN)))
        .sortBy { case (id, c) => (-c, id) }.take(20).map(_._1)
      q -> pool.map(id => (id, cos(q, id, vecs, norms)))
        .sortBy { case (id, c) => (-c, id) }.take(K).map(_._1)
    }.toMap
    val got = graft.SparkEntry.queries("embed_mrl_rerank_knn")(spark, Sf)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._3).map(_._2).toSeq }
    assert(got == expected)
  }

  test("re-ranking never loses recall vs the truncated-only ranking") {
    val mrl = graft.SparkEntry.queries("embed_matryoshka_recall")(spark, Sf)
      .as[(Long, Double)].collect().toMap
    val rr = graft.SparkEntry.queries("embed_mrl_rerank_recall")(spark, Sf)
      .as[(Long, Double)].collect().toMap
    assert(rr.keySet == mrl.keySet)
    rr.foreach { case (q, r) => assert(r >= mrl(q), s"query $q recall regressed") }
  }

  test("embed_matryoshka_recall equals the model rankings' overlap") {
    val full  = topK(vecs)
    val short = topK(vecs.map { case (id, v) => id -> v.take(32) })
    val expected = full.map { case (q, ids) =>
      q -> round6(ids.count(short(q).contains).toDouble / K)
    }
    val got = graft.SparkEntry.queries("embed_matryoshka_recall")(spark, Sf)
      .as[(Long, Double)].collect().toMap
    assert(got == expected)
    // the trade must be visible but not destructive on this corpus
    val mean = got.values.sum / got.size
    assert(mean > 0.2 && mean <= 1.0, s"mean recall $mean")
  }
}
