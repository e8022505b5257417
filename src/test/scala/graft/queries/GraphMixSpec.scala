package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-7 graph/mixing/audit operators, checked against independent
  * models (not against their own implementation): cell-blocked kNN graph
  * with mutuality, embedding decontamination, per-dimension variance,
  * CCNet-style LM terciles, temperature-scaled mixing weights, Zipf fit,
  * and type-token lexical diversity.
  */
class GraphMixSpec extends SparkSpec {
  import spark.implicits._

  private val Sf = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Same fold order as VectorExpressions.dot_product: left-to-right. */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private lazy val vecs: Map[Long, (Int, Array[Double])] =
    spark.read.parquet(s"$Sf/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getSeq[Float](2).map(_.toDouble).toArray))
      .toMap

  private def cos(a: Array[Double], b: Array[Double]): Double =
    round6(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))

  // --- embed_knn_graph ------------------------------------------------

  test("embed_knn_graph matches a brute-force within-cell model incl. mutual flags") {
    val out = graft.SparkEntry.queries("embed_knn_graph")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3), r.getBoolean(4)))
      .toMap

    // independent model: per vector, top-4 same-label neighbors by
    // (rounded cosine desc, id asc); mutual = reverse edge exists
    val byLabel = vecs.groupBy(_._2._1)
    val model = byLabel.values.flatMap { cell =>
      cell.flatMap { case (id, (_, v)) =>
        val nbrs = cell.toSeq.collect { case (nid, (_, nv)) if nid != id =>
          (nid, cos(v, nv))
        }.sortBy { case (nid, c) => (-c, nid) }.take(4)
        nbrs.zipWithIndex.map { case ((nid, c), i) =>
          (id, nid) -> (c, (i + 1).toLong)
        }
      }
    }.toMap
    assert(out.size == model.size)
    model.foreach { case (k @ (id, nid), (c, rank)) =>
      val (oc, orank, omutual) = out(k)
      assert(oc == c && orank == rank, s"edge $k")
      assert(omutual == model.contains((nid, id)), s"mutual $k")
    }
    // the graph must contain at least one non-mutual edge to make the
    // flag meaningful on this data
    assert(out.values.exists(!_._3) && out.values.exists(_._3))
  }

  // --- embed_decontaminate --------------------------------------------

  test("embed_decontaminate: nearest bench vector per corpus vector, deterministic split") {
    val out = graft.SparkEntry.queries("embed_decontaminate")(spark, Sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    val bench  = vecs.filter(_._1 % 50 == 0)
    val corpus = vecs.filter(_._1 % 50 != 0)
    assert(out.keySet == corpus.keySet)
    corpus.foreach { case (id, (_, v)) =>
      val (bid, bc) = bench.map { case (b, (_, bv)) => (b, cos(v, bv)) }
        .toSeq.sortBy { case (b, c) => (-c, b) }.head
      val (obid, oc, oflag) = out(id)
      assert(obid == bid && oc == bc, s"vec $id")
      assert(oflag == (bc >= 0.45), s"flag $id")
    }
  }

  // --- embed_dim_variance ---------------------------------------------

  test("embed_dim_variance: population moments per dimension, shares sum to 1") {
    val rows = graft.SparkEntry.queries("embed_dim_variance")(spark, Sf).collect()
    assert(rows.length == vecs.head._2._2.length)
    val n = vecs.size.toDouble
    rows.foreach { r =>
      val pos = r.getLong(0).toInt
      val xs  = vecs.values.map(_._2(pos))
      val mean = xs.sum / n
      val vr   = xs.map(x => (x - mean) * (x - mean)).sum / n
      assert(math.abs(r.getDouble(1) - mean) < 2e-6, s"mean dim $pos")
      assert(math.abs(r.getDouble(2) - vr) < 2e-6, s"var dim $pos")
    }
    val shareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 1e-4)
  }

  // --- lm_quality_buckets ---------------------------------------------

  test("lm_quality_buckets_exact: per-lang terciles ordered by nll, sizes within 1") {
    val rows = graft.SparkEntry.queries("lm_quality_buckets_exact")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    // every scored doc appears exactly once
    val scored = graft.SparkEntry.queries("text_lm_score")(spark, Sf)
      .select("doc_id", "nll").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows.map(_._1).toSet == scored.keySet)
    rows.foreach { case (id, _, nll, _) => assert(nll == scored(id)) }
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val by = rs.groupBy(_._4).view.mapValues(_.map(x => (x._3, x._1)).toSeq).toMap
      assert(by.keySet.subsetOf(Set("head", "middle", "tail")))
      // ntile size contract: any two buckets differ by at most 1
      val sizes = Seq("head", "middle", "tail").map(b => by.getOrElse(b, Nil).size)
      assert(sizes.max - sizes.filter(_ > 0).min <= 1, s"$lang sizes $sizes")
      // order contract on (nll, doc_id): head ends before middle begins
      def hi(b: String) = by.getOrElse(b, Nil).maxOption
      def lo(b: String) = by.getOrElse(b, Nil).minOption
      for (h <- hi("head"); m <- lo("middle"))
        assert(implicitly[Ordering[(Double, Long)]].lteq(h, m), s"$lang head/middle")
      for (m <- hi("middle"); t <- lo("tail"))
        assert(implicitly[Ordering[(Double, Long)]].lteq(m, t), s"$lang middle/tail")
    }
  }

  // --- sample_temperature ---------------------------------------------

  test("sample_temperature matches the w ∝ n^τ model and compresses spread at low τ") {
    val rows = graft.SparkEntry.queries("sample_temperature")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val counts = rows.map(r => r._1 -> r._2).toMap
    val s07 = counts.values.map(n => math.pow(n.toDouble, 0.7)).sum
    val s03 = counts.values.map(n => math.pow(n.toDouble, 0.3)).sum
    rows.foreach { case (src, n, w07, w03) =>
      assert(math.abs(w07 - math.pow(n.toDouble, 0.7) / s07) < 2e-6, src)
      assert(math.abs(w03 - math.pow(n.toDouble, 0.3) / s03) < 2e-6, src)
    }
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
    // lower temperature flattens the mixture: max/min ratio shrinks
    val r07 = rows.map(_._3).max / rows.map(_._3).min
    val r03 = rows.map(_._4).max / rows.map(_._4).min
    assert(r03 <= r07 + 1e-9)
  }

  // --- source_zipf_fit ------------------------------------------------

  test("source_zipf_fit matches an independent least-squares model") {
    val rows = graft.SparkEntry.queries("source_zipf_fit")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val wc = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source", "w").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    rows.foreach { case (src, nTop, slope, intercept) =>
      val top = wc.filter(_._1 == src).map { case (_, w, c) => (w, c) }
        .sortBy { case (w, c) => (-c, w) }.take(100)
      assert(nTop == top.length.toLong)
      val pts = top.zipWithIndex.map { case ((_, c), i) =>
        (math.log((i + 1).toDouble), math.log(c.toDouble))
      }
      val n  = pts.length.toDouble
      val mx = pts.map(_._1).sum / n
      val my = pts.map(_._2).sum / n
      val sl = pts.map { case (x, y) => (x - mx) * (y - my) }.sum /
        pts.map { case (x, _) => (x - mx) * (x - mx) }.sum
      assert(math.abs(slope - sl) < 1e-4, s"$src slope")
      assert(math.abs(intercept - (my - sl * mx)) < 1e-3, s"$src intercept")
      assert(slope < 0.0, s"$src must be frequency-decreasing")
    }
  }

  // --- lexical_diversity ----------------------------------------------

  test("lexical_diversity: crafted corpus with known TTRs") {
    val docs = Seq(
      (1L, "a a a a", "s0"),     // TTR 0.25
      (2L, "a b c d", "s0"),     // TTR 1.0
      (3L, "x y x y x y", "s1")  // TTR 1/3
    ).toDF("doc_id", "text", "source")
    val tmp = java.nio.file.Files.createTempDirectory("lexdiv").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.SparkEntry.queries("lexical_diversity")(spark, tmp)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out("s0") == ((2L, 8L, 0.625)))
    assert(out("s1")._1 == 1L && out("s1")._2 == 6L)
    assert(math.abs(out("s1")._3 - round6(1.0 / 3.0)) < 1e-9)
  }
}
