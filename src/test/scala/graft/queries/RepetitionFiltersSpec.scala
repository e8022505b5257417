package graft.queries

import graft.SparkSpec

/** Gopher/C4 repetition filters on planted degenerate docs: each metric
  * must fire on exactly the pathology it targets and pass clean text.
  */
class RepetitionFiltersSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: (Long, String)*) = {
    DocQueries.repetitionFilters(docs.toSeq.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("duplicate lines drive dup_line_frac and dup_line_char_frac") {
    val out = run(
      1L -> "alpha beta gamma\nalpha beta gamma\nalpha beta gamma\ndelta epsilon zeta",
      2L -> "one two three\nfour five six\nseven eight nine")
    val r1 = out(1L)
    // 4 lines, 2 distinct → 2 duplicate occurrences
    assert(r1.getAs[Double]("dup_line_frac") == 0.5)
    // 2 extra copies × 16 chars / 69 total chars
    assert(r1.getAs[Double]("dup_line_char_frac") == math.rint(2.0 * 16 / 69 * 1e6) / 1e6)
    assert(!r1.getAs[Boolean]("keep"))
    val r2 = out(2L)
    assert(r2.getAs[Double]("dup_line_frac") == 0.0)
    assert(r2.getAs[Double]("dup_line_char_frac") == 0.0)
  }

  test("degenerate n-gram repetition drives top-gram concentration") {
    val looped = Seq.fill(12)("spam ham").mkString(" ")
    val out = run(3L -> looped,
      4L -> "every word here is different from all other words present")
    val r3 = out(3L)
    // 'spam ham' or 'ham spam' dominates; 12 occurrences × 8 chars
    assert(r3.getAs[Double]("top2gram_char_frac") > 0.20)
    assert(r3.getAs[Double]("top3gram_char_frac") > 0.18)
    assert(!r3.getAs[Boolean]("keep"))
    val r4 = out(4L)
    assert(r4.getAs[Double]("top2gram_char_frac") < 0.20)
    assert(r4.getAs[Boolean]("keep"))
  }

  test("symbol soup and non-alpha words fail their ratios") {
    val out = run(
      5L -> "#### $$$$ %%%% normal #### $$$$ text 1234 5678 9012 3456 7890",
      6L -> "plain readable text with ordinary vocabulary throughout entire document")
    val r5 = out(5L)
    assert(r5.getAs[Double]("symbol_word_ratio") > 0.10)
    assert(r5.getAs[Double]("alpha_word_frac") < 0.80)
    assert(!r5.getAs[Boolean]("keep"))
    val r6 = out(6L)
    assert(r6.getAs[Double]("symbol_word_ratio") == 0.0)
    assert(r6.getAs[Double]("alpha_word_frac") == 1.0)
    assert(r6.getAs[Double]("mean_word_len") >= 3.0)
    assert(r6.getAs[Boolean]("keep"))
  }

  test("extreme word lengths fail the mean-word-length band") {
    val out = run(
      7L -> "a b c d e f g h i j k l m n o p",
      8L -> "pneumonoultramicroscopic silicovolcanoconiosis incomprehensibilities uncharacteristically")
    assert(out(7L).getAs[Double]("mean_word_len") < 3.0)
    assert(!out(7L).getAs[Boolean]("keep"))
    assert(out(8L).getAs[Double]("mean_word_len") > 10.0)
    assert(!out(8L).getAs[Boolean]("keep"))
  }

  test("single-token and two-token docs don't crash the gram windows") {
    val out = run(9L -> "solo", 10L -> "two words")
    assert(out(9L).getAs[Double]("top2gram_char_frac") == 0.0)
    assert(out(9L).getAs[Double]("top3gram_char_frac") == 0.0)
    assert(out(10L).getAs[Double]("top3gram_char_frac") == 0.0)
  }
}
