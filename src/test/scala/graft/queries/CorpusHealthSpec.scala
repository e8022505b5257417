package graft.queries

import graft.SparkSpec

/** Corpus-health audit operators, checked against independent models:
  * Zipf-slope fit (exact power-law fixture), per-source boilerplate gram
  * (planted template + tie-break proof), language-ID confusion matrix
  * (profile-bearing fixtures), and chunk-level exact dedup (planted
  * duplicate sequences).
  */
class CorpusHealthSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def writeDocs(rows: Seq[(Long, String, String, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("health").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  // --- token_zipf_fit --------------------------------------------------

  test("token_zipf_fit: exact 1/rank frequencies fit slope -1 with r2 = 1") {
    // cnt = 12/rank for ranks 1..4 → ln(cnt) = ln 12 − ln(rank): an EXACT
    // line with slope −1, so the regression has nothing to estimate
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val dir = writeDocs(Seq((1L, text, "en", "s")))
    val r = graft.SparkEntry.queries("token_zipf_fit")(spark, dir).collect()(0)
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == -1.0)
    assert(math.abs(r.getDouble(2) - math.log(12.0)) < 1e-6)
    assert(r.getDouble(3) == 1.0)
  }

  test("token_zipf_fit: rank ties break on the word, not arrival order") {
    // b and c tie at 2 occurrences; ranks must be (a,b,c) = (1,2,3)
    // whichever partition order the counts arrive in
    val dir = writeDocs(Seq((1L, "a a a a c c b b", "en", "s")))
    val r = graft.SparkEntry.queries("token_zipf_fit")(spark, dir).collect()(0)
    assert(r.getLong(0) == 3L)
    // independent OLS over (ln 1, ln 4), (ln 2, ln 2), (ln 3, ln 2)
    val xs = Seq(1.0, 2.0, 3.0).map(math.log)
    val ys = Seq(4.0, 2.0, 2.0).map(math.log)
    val mx = xs.sum / 3; val my = ys.sum / 3
    val slope = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
      xs.map(x => (x - mx) * (x - mx)).sum
    assert(math.abs(r.getDouble(1) - slope) < 1e-6)
  }

  // --- boilerplate_per_source -----------------------------------------

  test("boilerplate_per_source: planted template wins; counts and share are exact") {
    val template = "click here to accept all cookies and continue now"
    val dir = writeDocs(Seq(
      (1L, s"$template alpha beta gamma", "en", "web"),
      (2L, s"delta $template epsilon", "en", "web"),
      (3L, "one two three four five six seven eight nine ten", "en", "web"),
      (4L, "p q r s t u v w", "en", "clean")
    ))
    val out = graft.SparkEntry.queries("boilerplate_per_source")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // the 9-token template contributes its leading 8-gram twice (once per
    // doc); every other web 8-gram occurs once
    val (gram, occ, docs, share) = out("web")
    assert(gram == "click here to accept all cookies and continue")
    assert(occ == 2L && docs == 2L)
    assert(math.abs(share - 2.0 / 3.0) < 1e-5)
    // single-doc source: its only 8-gram, share 1.0
    assert(out("clean") == (("p q r s t u v w", 1L, 1L, 1.0)))
  }

  test("boilerplate_per_source: count ties break to the lexicographically smallest gram") {
    val dir = writeDocs(Seq(
      (1L, "b b b b b b b b", "en", "s"),
      (2L, "a a a a a a a a", "en", "s")
    ))
    val r = graft.SparkEntry.queries("boilerplate_per_source")(spark, dir).collect()(0)
    assert(r.getString(1) == "a a a a a a a a")
    assert(r.getLong(2) == 1L && r.getLong(3) == 1L)
  }

  // --- langid_confusion ------------------------------------------------

  test("langid_confusion: off-diagonal cells count mispredictions; shares row-normalize") {
    val dir = writeDocs(Seq(
      // German profile trigrams ("der", "und", "sch") — predicted de
      (1L, "der hund und die schule", "de", "s"),
      (2L, "der wind und das schiff", "de", "s"),
      // labeled de but profile-free → falls through to en (a miss)
      (3L, "zzz qqq vvv", "de", "s"),
      // English profile (" th", "ing", "and") — predicted en
      (4L, "the king and the thing", "en", "s")
    ))
    val out = graft.SparkEntry.queries("langid_confusion")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out(("de", "de")) == ((2L, 0.666667)))
    assert(out(("de", "en")) == ((1L, 0.333333)))
    assert(out(("en", "en")) == ((1L, 1.0)))
    assert(!out.contains(("en", "de")))
    // shares within each labeled lang sum to 1
    val sums = out.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2._2).sum).toMap
    sums.values.foreach(v => assert(math.abs(v - 1.0) < 1e-5))
  }

  // --- quality_percentile_by_source ------------------------------------

  test("quality_percentile_by_source_exact: ranks span [0,1] per source, monotone in score") {
    val rows = graft.SparkEntry.queries("quality_percentile_by_source_exact")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val sorted = rs.sortBy(_._3)
      assert(sorted.head._3 == 0.0 && math.abs(sorted.last._3 - 1.0) < 1e-9, src)
      // percent_rank ordering must agree with quality ordering
      sorted.sliding(2).foreach {
        case Array((_, q1, p1), (_, q2, p2)) =>
          assert(p1 <= p2 && (q1 <= q2 || p1 == p2), s"$src: ($q1,$p1) vs ($q2,$p2)")
        case _ =>
      }
    }
  }

  // --- lsh_band_stats ---------------------------------------------------

  test("lsh_band_stats: occupancy masses account for every banded doc in every band") {
    val sf   = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("lsh_band_stats")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    // docs entering banding = docs with ≥3 tokens (the shingle floor)
    val banded = graft.core.Graft.documents(spark, sf)
      .filter("size(split(text, ' ')) >= 3").count()
    rows.groupBy(_._1).foreach { case (band, rs) =>
      val mass = rs.map(r => r._2 * r._3).sum
      assert(mass == banded, s"band $band covers $mass of $banded docs")
    }
  }

  // --- ngram_pmi --------------------------------------------------------

  test("ngram_pmi: planted collocation scores the hand-computed PMI") {
    // one doc: (p q)×5 then 5 filler singletons → only (p,q) reaches the
    // count floor; unigrams p=5 q=5 of 15 tokens, bigrams total 14
    val dir = writeDocs(Seq((1L, "p q p q p q p q p q r s t u v", "en", "s")))
    val out = graft.SparkEntry.queries("ngram_pmi")(spark, dir).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getString(0) == "p" && r.getString(1) == "q" && r.getLong(2) == 5L)
    val expect = math.log(5.0 / 14.0 * (15.0 / 5.0) * (15.0 / 5.0))
    assert(math.abs(r.getDouble(3) - expect) < 1e-6)
  }

  // --- sample_weighted --------------------------------------------------

  test("sample_weighted: A-ES keys are md5-faithful and rank in descending order") {
    // one source, six docs, all weight 0.515 ("p q r": 3 tokens, no
    // stopwords → min(0.03,1)·0.5 + 0.5)
    val dir = writeDocs((1L to 6L).map(i => (i, "p q r", "en", "s")))
    val out = graft.SparkEntry.queries("sample_weighted")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .sortBy(_._4)
    assert(out.length == 6)
    def key(id: Long): Double = {
      val u = (java.lang.Long.parseLong(md5hex(s"$id#wrs").take(8), 16) + 0.5) / 4294967296.0
      BigDecimal(math.log(u) / 0.515)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = (1L to 6L).map(i => i -> key(i)).sortBy { case (id, k) => (-k, id) }
    out.zip(expected).zipWithIndex.foreach { case (((id, w, k, rank), (eid, ek)), i) =>
      assert(id == eid && rank == i + 1, s"rank ${i + 1}: got doc $id, want $eid")
      assert(math.abs(k - ek) < 1e-9 && math.abs(w - 0.515) < 1e-9)
    }
  }

  // --- corpus_datacard --------------------------------------------------

  test("corpus_datacard: counts, dup rate, and shares from a crafted corpus") {
    val dir = writeDocs(Seq(
      (1L, "p q r s", "en", "s1"),
      (2L, "p q r s", "en", "s1"), // exact dup of doc 1
      (3L, "w x y z", "de", "s2")
    ))
    val r = graft.SparkEntry.queries("corpus_datacard")(spark, dir).collect()(0)
    assert(r.getLong(0) == 3L)                      // n_docs
    assert(r.getLong(1) == 2L)                      // n_unique_docs
    assert(r.getLong(2) == 2L && r.getLong(3) == 2L) // sources, langs
    assert(r.getLong(4) == 12L)                     // total_tokens
    assert(r.getLong(5) == 7L * 3)                  // total_chars
    assert(math.abs(r.getDouble(6) - 1.0 / 3.0) < 1e-5) // dup_rate
    // quality of every doc: min(4/100,1)*0.5 + (1 − 0)*0.5 = 0.52
    assert(math.abs(r.getDouble(7) - 0.52) < 1e-9)
    assert(math.abs(r.getDouble(8) - 2.0 / 3.0) < 1e-5) // en_share
  }

  // --- ngram_novelty ----------------------------------------------------

  test("ngram_novelty: first occurrence owns the gram; verbatim copy scores zero") {
    val dir = writeDocs(Seq(
      (1L, "a b c d e f g h", "en", "s"), // 4 distinct 5-grams, all first here
      (2L, "a b c d e f g h", "en", "s"), // verbatim copy → nothing novel
      (3L, "q r s t u v w x", "en", "s")  // disjoint vocabulary → all novel
    ))
    val out = graft.SparkEntry.queries("ngram_novelty")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(1L) == ((4L, 4L, 1.0)))
    assert(out(2L) == ((4L, 0L, 0.0)))
    assert(out(3L) == ((4L, 4L, 1.0)))
  }

  // --- dedup_chunk_exact ----------------------------------------------

  test("dedup_chunk_exact: cross-doc duplicate windows surface, unique ones don't") {
    val shared = (1 to 40).map(i => s"w$i").mkString(" ") // 2 chunks: [1..32], [25..40]
    val dir = writeDocs(Seq(
      (1L, shared, "en", "s"),
      (2L, shared, "en", "s"),
      (3L, (100 to 140).map(i => s"u$i").mkString(" "), "en", "s")
    ))
    val rows = graft.SparkEntry.queries("dedup_chunk_exact")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // both of the shared doc's chunks are duplicated exactly twice,
    // canonical owner is doc 1; doc 3's chunks never appear
    assert(rows.length == 2)
    rows.foreach { case (_, copies, docs, canon) =>
      assert(copies == 2L && docs == 2L && canon == 1L)
    }
  }
}
