package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-7 calibration operators, checked against independent models and
  * cross-query consistency with already-oracle-verified neighbors:
  * dedup threshold sweep, simhash distance histogram, nll-by-length
  * confound audit, and the heuristic-vs-LM correlation.
  */
class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  private val Sf = "/root/testdata/sf0.001"

  // --- dedup_threshold_sweep ------------------------------------------

  test("dedup_threshold_sweep: full spine, monotone, consistent with the similarity histogram") {
    val rows = graft.SparkEntry.queries("dedup_threshold_sweep")(spark, Sf)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0.1, 0.3, 0.5, 0.7, 0.9))
    // tightening the cutoff can only shrink both counts
    rows.sliding(2).foreach { case Array((_, p1, d1), (_, p2, d2)) =>
      assert(p2 <= p1 && d2 <= d1)
    }
    rows.foreach { case (_, p, d) => assert(d <= 2 * p) }
    // thresholds align with 0.05-bin edges: pairs at cutoff t must equal
    // the histogram mass in bins >= 20t (the histogram is oracle-checked)
    val hist = graft.SparkEntry.queries("dedup_similarity_histogram")(spark, Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (t, p, _) =>
      val expect = hist.filter { case (bin, _) => bin >= math.round(t * 20) }
        .values.sum
      assert(p == expect, s"threshold $t")
    }
  }

  // --- simhash_distance_histogram -------------------------------------

  test("simhash_distance_histogram: verbatim copies collide at distance 0; mass below 7 matches the pair query") {
    val rows = graft.SparkEntry.queries("simhash_distance_histogram")(spark, Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keys.forall(h => h >= 0 && h <= 32))
    val nearMass = rows.filter(_._1 <= 6).values.sum
    val pairRows = graft.SparkEntry.queries("dedup_simhash_pairs")(spark, Sf).count()
    assert(nearMass == pairRows)

    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "s"),
      (2L, "alpha beta gamma delta epsilon zeta", "s"), // verbatim copy
      (3L, "one two three four five six", "s")
    ).toDF("doc_id", "text", "source")
    val tmp = java.nio.file.Files.createTempDirectory("shh").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val crafted = graft.SparkEntry.queries("simhash_distance_histogram")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(crafted.getOrElse(0L, 0L) >= 1L, "copy pair must land at hamming 0")
  }

  // --- nll_by_length ---------------------------------------------------

  test("nll_by_length matches a model built from text_lm_score + token counts") {
    val nll = graft.SparkEntry.queries("text_lm_score")(spark, Sf)
      .select("doc_id", "nll").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lens = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val model = nll.toSeq
      .map { case (id, v) => (lens(id), v) }
      .filter(_._1 >= 1)
      .groupBy { case (n, _) =>
        math.pow(2.0, math.floor(math.log(n.toDouble) / math.log(2.0))).toLong
      }
      .map { case (b, xs) =>
        val mean = xs.map { case (_, v) => BigDecimal(v).setScale(6) }.sum /
          xs.length
        b -> (xs.length.toLong,
          mean.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    val out = graft.SparkEntry.queries("nll_by_length")(spark, Sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == model.keySet)
    model.foreach { case (b, (n, m)) =>
      assert(out(b)._1 == n, s"bin $b count")
      assert(math.abs(out(b)._2 - m) < 2e-6, s"bin $b mean")
    }
  }

  // --- quality_lm_correlation ------------------------------------------

  test("quality_lm_correlation matches an independent Pearson model per source") {
    val nll = graft.SparkEntry.queries("text_lm_score")(spark, Sf)
      .select("doc_id", "nll").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val qs = graft.SparkEntry.queries("text_quality")(spark, Sf)
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val src = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = graft.SparkEntry.queries("quality_lm_correlation")(spark, Sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val bySrc = nll.keys.filter(qs.contains).groupBy(src)
    assert(out.keySet == bySrc.keySet)
    bySrc.foreach { case (s0, ids0) =>
      val xs = ids0.toSeq.map(qs)
      val ys = ids0.toSeq.map(nll)
      val n  = xs.length.toDouble
      val mx = xs.sum / n; val my = ys.sum / n
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val r = cov / math.sqrt(
        xs.map(x => (x - mx) * (x - mx)).sum * ys.map(y => (y - my) * (y - my)).sum)
      assert(out(s0)._1 == ids0.size.toLong, s"$s0 n_docs")
      assert(math.abs(out(s0)._2 - r) < 1e-4, s"$s0 corr")
      assert(out(s0)._2 >= -1.0 && out(s0)._2 <= 1.0)
    }
  }
}
