package graft.operators

import graft.SparkSpec

/** Model-based check of BPE vocabulary induction: the distributed learner
  * must produce exactly the merge sequence of a naive single-threaded
  * implementation of Sennrich et al.'s algorithm (same tie-break), and
  * encoding must agree with the naive greedy-rank encoder.
  */
class BpeVocabSpec extends SparkSpec {

  /** Naive reference model: dict-of-words BPE, leftmost-first fusing,
    * ties broken by (left, right) lexicographic order.
    */
  private def naiveLearn(wordFreq: Map[String, Long], n: Int): Seq[BpeVocab.Merge] = {
    var words: Map[Vector[String], Long] =
      wordFreq.map { case (w, f) => (w.map(_.toString).toVector :+ BpeVocab.EndMarker) -> f }
    val out = Seq.newBuilder[BpeVocab.Merge]
    for (rank <- 0 until n) {
      val counts = words.toSeq.flatMap { case (syms, f) =>
        syms.zip(syms.tail).map(p => p -> f)
      }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out += BpeVocab.Merge(rank, l, r, c)
        words = words.groupBy { case (syms, _) => fuse(syms, l, r) }
          .map { case (syms, grp) => syms -> grp.values.sum }
      }
    }
    out.result()
  }

  private def fuse(syms: Vector[String], l: String, r: String): Vector[String] = {
    val acc = Vector.newBuilder[String]
    var last: Option[String] = None
    for (x <- syms) {
      if (last.contains(l) && x == r) { last = Some(l + r) }
      else { last.foreach(acc += _); last = Some(x) }
    }
    last.foreach(acc += _)
    acc.result()
  }

  private val corpus = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  private def wordFreqDf = {
    import spark.implicits._
    corpus.toSeq.toDF("word", "freq")
  }

  test("learn matches the naive model on the Sennrich corpus, merge for merge") {
    val got  = BpeVocab.learn(wordFreqDf, 12)
    val want = naiveLearn(corpus, 12)
    assert(got == want)
    // the paper's famous first merges: es, est, est</w> (freq 9 each)
    assert(got.take(3).map(m => m.left + m.right) == Seq("es", "est", "est</w>"))
    assert(got.take(3).forall(_.freq == 9L))
  }

  test("learn stops when no pair remains instead of looping") {
    import spark.implicits._
    val tiny = Seq(("ab", 3L)).toDF("word", "freq")
    // "ab" + marker has 3 symbols -> at most 2 merges possible
    val got = BpeVocab.learn(tiny, 10)
    assert(got.length == 2)
    assert(got.map(m => m.left + m.right) == Seq("ab", "ab</w>"))
  }

  test("fusePair is leftmost-first on overlapping runs (aaa -> aa|a)") {
    val got = BpeVocab.learn(
      { import spark.implicits._; Seq(("aaa", 1L)).toDF("word", "freq") }, 1)
    // the first merge must be (a,a); encoding aaa under it gives [aa, a, </w>]
    assert(got.head.left == "a" && got.head.right == "a")
    val enc = BpeVocab.encodeWord(Map(("a", "a") -> 0), "aaa")
    assert(enc == Seq("aa", "a", BpeVocab.EndMarker))
  }

  test("encode agrees with naive rank-greedy encoding on unseen words") {
    val merges = BpeVocab.learn(wordFreqDf, 10)
    val ranks  = merges.map(m => (m.left, m.right) -> m.rank).toMap
    import spark.implicits._
    val docs = Seq((1L, "lowest widest newer"), (2L, ""), (3L, null: String))
      .toDF("doc_id", "text")
    val out = BpeVocab.encode(docs, merges).orderBy("doc_id").collect()
    val expected = "lowest widest newer".split(" ").toSeq
      .flatMap(BpeVocab.encodeWord(ranks, _))
    assert(out(0).getSeq[String](2) == expected)
    assert(out(1).getSeq[String](2) == Seq.empty)
    assert(out(2).isNullAt(2))
  }

  test("priority encoding equals rank-order sequential fusing on corpus words") {
    // the property the bpe_encode_stats oracle relies on: applying merges
    // in rank order with full greedy fusing equals the priority encoder,
    // because a merge only creates pairs of strictly higher rank
    import spark.implicits._
    val wf = BpeVocab.wordFrequencies(
      graft.core.Graft.documents(spark, "/root/testdata/sf0.001"))
    val merges = BpeVocab.learn(wf, 6)
    val ranks  = merges.map(m => (m.left, m.right) -> m.rank).toMap
    wf.select("word").as[String].collect().foreach { w =>
      var syms = w.map(_.toString).toVector :+ BpeVocab.EndMarker
      merges.foreach(m => syms = fuse(syms, m.left, m.right))
      assert(BpeVocab.encodeWord(ranks, w) == syms, s"word $w")
    }
  }

  test("wordFrequencies counts the corpus once") {
    import spark.implicits._
    val docs = Seq("low low  lower", "newest").toDF("text")
    val wf = BpeVocab.wordFrequencies(docs).as[(String, Long)].collect().toMap
    assert(wf == Map("low" -> 2L, "lower" -> 1L, "newest" -> 1L))
  }
}
