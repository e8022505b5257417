package graft.queries

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-6 corpus-audit/split operators, checked against independent
  * models (not against their own implementation): cross-doc duplicate
  * 5-gram fraction, deterministic train/val/test assignment, power-of-two
  * length histogram, and per-source unigram KL divergence.
  */
class CorpusAuditSpec extends SparkSpec {
  import spark.implicits._

  private val Sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // --- dedup_dup_ngram_fraction ---------------------------------------

  test("dup_ngram_fraction: crafted corpus — verbatim copy is fully duplicated") {
    val docs = Seq(
      (1L, "a b c d e f g h", "s"),   // shares the full window set with doc 2
      (2L, "a b c d e f g h", "s"),   // verbatim copy
      (3L, "q r s t u v w x", "s")    // disjoint vocabulary
    ).toDF("doc_id", "text", "source")
    val tmp = java.nio.file.Files.createTempDirectory("audit").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.SparkEntry.queries("dedup_dup_ngram_fraction")(spark, tmp)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // 8 tokens → 4 windows of 5-grams each
    assert(out(1L) == ((4L, 4L, 1.0)))
    assert(out(2L) == ((4L, 4L, 1.0)))
    assert(out(3L) == ((4L, 0L, 0.0)))
  }

  // --- split_assign ---------------------------------------------------

  test("split_assign: deterministic, exhaustive, and hash-faithful") {
    val rows = graft.SparkEntry.queries("split_assign")(spark, Sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id     = r.getLong(0)
      val bucket = java.lang.Long.parseLong(md5hex(s"split:$id").take(8), 16) % 100
      assert(r.getLong(2) == bucket, s"doc $id bucket")
      val expect = if (bucket < 80) "train" else if (bucket < 90) "val" else "test"
      assert(r.getString(3) == expect, s"doc $id split")
    }
    // all three splits populated at 500 docs, fractions near 80/10/10
    val by = rows.groupBy(_.getString(3)).view.mapValues(_.length).toMap
    assert(by.keySet == Set("train", "val", "test"))
    assert(by("train") > 350 && by("val") > 20 && by("test") > 20)
  }

  test("split_assign is independent of the sampling hash (different salt)") {
    // same doc_id must NOT land in the same bucket as sample_stratified's
    // unsalted hash for all docs (that would couple split and sample)
    val coupled = (0L until 500L).count { id =>
      val split  = java.lang.Long.parseLong(md5hex(s"split:$id").take(8), 16) % 100
      val sample = java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) % 100
      split == sample
    }
    assert(coupled < 25, s"salted and unsalted buckets coincide for $coupled/500 docs")
  }

  test("split_ngram_leakage: full-corpus duplicates leak, unique docs don't") {
    // find one doc_id for each split under the salted hash, give the val
    // doc text copied from the train doc (full leak) and the test doc
    // disjoint text (zero leak)
    def splitOf(id: Long): String = {
      val b = java.lang.Long.parseLong(md5hex(s"split:$id").take(8), 16) % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    val ids     = (0L until 200L)
    val trainId = ids.find(splitOf(_) == "train").get
    val valId   = ids.find(splitOf(_) == "val").get
    val testId  = ids.find(splitOf(_) == "test").get
    val shared  = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (trainId, shared, "s"),
      (valId, shared, "s"),                                  // verbatim from train
      (testId, (50 to 70).map(i => s"q$i").mkString(" "), "s") // disjoint
    ).toDF("doc_id", "text", "source")
    val tmp = java.nio.file.Files.createTempDirectory("audit_leak").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.SparkEntry.queries("split_ngram_leakage")(spark, tmp)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("val") == ((16L, 16L, 1.0)), s"val row: ${out.get("val")}")
    assert(out("test") == ((17L, 0L, 0.0)), s"test row: ${out.get("test")}")
  }

  // --- length_histogram -----------------------------------------------

  test("length_histogram: buckets are powers of two and partition the corpus") {
    val rows = graft.SparkEntry.queries("length_histogram")(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lo = r.getLong(1)
      assert(java.lang.Long.bitCount(lo) == 1, s"bucket_lo $lo not a power of two")
    }
    val totalDocs = rows.map(_.getLong(2)).sum
    val nonEmptyDocs = graft.core.Graft.documents(spark, Sf)
      .filter(size(split(col("text"), " ")) >= 1).count()
    assert(totalDocs == nonEmptyDocs)
  }

  // --- calibration curves + embedding audit ---------------------------

  test("quality_threshold_sweep: retention is monotone and exhaustive at 0") {
    val rows = graft.SparkEntry.queries("quality_threshold_sweep")(spark, Sf)
      .orderBy("threshold").collect()
    assert(rows.length == 10)
    val docsKept = rows.map(_.getLong(1)).toSeq
    val toksKept = rows.map(_.getLong(2)).toSeq
    assert(docsKept == docsKept.sorted.reverse, "doc retention not monotone")
    assert(toksKept == toksKept.sorted.reverse, "token retention not monotone")
    assert(docsKept.head == 500L) // threshold 0.0 keeps every doc
  }

  test("dedup_similarity_histogram: bins partition the unthresholded pair set") {
    val hist = graft.SparkEntry.queries("dedup_similarity_histogram")(spark, Sf).collect()
    val allPairs = DocQueries
      .minhashLshPairs(graft.core.Graft.documents(spark, Sf), minJac = 0.0).count()
    assert(hist.map(_.getLong(1)).sum == allPairs)
    hist.foreach { r =>
      assert(r.getLong(0) >= 0L && r.getLong(0) <= 20L)
      val lo = r.getLong(0) / 20.0
      assert(r.getDouble(2) >= lo - 1e-9 && r.getDouble(2) < lo + 0.05 + 1e-9,
        s"avg_jac ${r.getDouble(2)} outside bin ${r.getLong(0)}")
    }
  }

  test("embed_ood_outliers: exactly the below-threshold rows, none fabricated") {
    val out = graft.SparkEntry.queries("embed_ood_outliers")(spark, Sf).collect()
    out.foreach(r => assert(r.getDouble(2) < 0.5, s"vec ${r.getLong(0)} not an outlier"))
    assert(out.map(_.getLong(0)).distinct.length == out.length, "duplicate vec rows")
    assert(out.length <= graft.core.Graft.embeddings(spark, Sf).count())
  }

  test("embed_ivf_recall_curve: recall is monotone in probe count") {
    val rows = graft.SparkEntry.queries("embed_ivf_recall_curve")(spark, Sf)
      .orderBy("n_probe").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    val recalls = rows.map(_.getDouble(2)).toSeq
    assert(recalls == recalls.sorted, s"recall not monotone in probes: $recalls")
    assert(recalls.forall(r => r >= 0.0 && r <= 1.0))
  }

  test("pack_boundary_stats + dedup_cluster_sizes: internal consistency") {
    val pk = graft.SparkEntry.queries("pack_boundary_stats")(spark, Sf).collect()
    pk.foreach { r =>
      assert(r.getLong(4) <= r.getLong(1), "spanning_docs exceeds n_docs")
      assert(r.getLong(3) * 2048L >= r.getLong(2), "bins don't cover tokens")
    }
    val cs = graft.SparkEntry.queries("dedup_cluster_sizes")(spark, Sf).collect()
    val labeled = graft.SparkEntry.queries("dedup_clusters")(spark, Sf).count()
    assert(cs.map(r => r.getLong(0) * r.getLong(1)).sum == labeled,
      "cluster size histogram does not partition the labeled docs")
    cs.foreach(r => assert(r.getLong(0) >= 2, "singleton clusters should not appear"))
  }

  test("embed_norm_stats: counts cover the table, bounds ordered") {
    val rows = graft.SparkEntry.queries("embed_norm_stats")(spark, Sf).collect()
    val total = graft.core.Graft.embeddings(spark, Sf).count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      assert(r.getLong(2) == 0L, "unexpected zero-norm vectors in testdata")
      assert(r.getDouble(3) <= r.getDouble(5) && r.getDouble(5) <= r.getDouble(4),
        s"min/avg/max out of order for label ${r.get(0)}")
    }
  }

  test("vocab_coverage_sweep: coverage is monotone in k and hits 1.0 at full vocab") {
    val rows = graft.SparkEntry.queries("vocab_coverage_sweep")(spark, Sf)
      .orderBy("k").collect()
    assert(rows.length == 5)
    val cov = rows.map(_.getDouble(2)).toSeq
    assert(cov == cov.sorted, "coverage not monotone in k")
    // the synthetic vocab is far smaller than k=10000: full coverage there
    assert(math.abs(cov.last - 1.0) < 1e-9)
    rows.foreach(r => assert(r.getLong(1) <= r.getLong(0), "vocab_size exceeds k"))
  }

  // --- winnow_matches -------------------------------------------------

  test("winnow_matches: verbatim overlap is caught, disjoint docs are not") {
    val shared = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, shared + " tail one extra words here", "s"),
      (2L, "lead in tokens then " + shared, "s"),
      (3L, (100 to 140).map(i => s"z$i").mkString(" "), "s")
    ).toDF("doc_id", "text", "source")
    val tmp = java.nio.file.Files.createTempDirectory("audit_win").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = graft.SparkEntry.queries("winnow_matches")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // winnowing guarantees ≥1 shared print per ≥6-token verbatim overlap
    // window; a 40-token overlap yields far more than the 5-print floor
    assert(pairs.contains((1L, 2L)), s"overlap pair missing: $pairs")
    assert(pairs((1L, 2L)) >= 5L)
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  // --- source_unigram_kl ----------------------------------------------

  test("source_unigram_kl: non-negative, zero only for corpus-identical source") {
    val rows = graft.SparkEntry.queries("source_unigram_kl")(spark, Sf).collect()
    assert(rows.length == 20) // one row per source
    rows.foreach { r =>
      assert(r.getDouble(1) >= 0.0, s"KL(${r.getString(0)}) negative") // Gibbs
      assert(r.getLong(2) > 0)
    }
  }

  test("source_unigram_kl: skewed crafted source has larger KL than balanced") {
    val docs = (
      (1 to 10).map(i => (i.toLong, "a b c d", "balanced")) ++
        (1 to 10).map(i => (100L + i, "a a a a", "skewed"))
    ).toDF("doc_id", "text", "source")
    val tmp = java.nio.file.Files.createTempDirectory("audit_kl").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val kl = graft.SparkEntry.queries("source_unigram_kl")(spark, tmp)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(kl("skewed") > kl("balanced"))
  }
}
