package graft.queries

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Substring-level span dedup on planted cross-doc verbatim runs: exact
  * span boundaries (token + char), maximal-span merging across
  * consecutive duplicated grams, shared span fingerprints, and the
  * one-pass rolling gram hash agreeing with a per-window fold.
  */
class SubstringSpanSpec extends SparkSpec {
  import spark.implicits._

  private val W = 50

  private val shared  = (1 to 60).map(i => s"shared$i")
  private def doc(id: Long, toks: Seq[String]) = (id, toks.mkString(" "))

  test("planted 50-token run is found with exact token and char offsets") {
    val d = Seq(
      doc(1, shared.take(50) ++ (1 to 30).map(i => s"una$i")),
      doc(2, (1 to 10).map(i => s"unb$i") ++ shared.take(50) ++ (1 to 5).map(i => s"unc$i")),
      doc(3, (1 to 80).map(i => s"solo$i"))
    ).toDF("doc_id", "text")

    val rows = DocQueries.substringSpans(d, W)
      .orderBy("doc_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))

    val Array(r1, r2) = rows
    // doc 1: span is tokens [1, 50] — a single duplicated gram
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(6)) == ((1L, 50L, 1L)))
    assert(r1.getLong(3) == 1L) // char_start
    assert(r1.getLong(4) == shared.take(50).mkString(" ").length.toLong)

    // doc 2: same run at tokens [11, 60]
    assert((r2.getLong(1), r2.getLong(2), r2.getLong(6)) == ((11L, 60L, 1L)))
    val head = (1 to 10).map(i => s"unb$i").mkString(" ")
    assert(r2.getLong(3) == head.length + 2L)
    assert(r2.getLong(4) ==
      head.length + 1L + shared.take(50).mkString(" ").length)

    // identical verbatim content ⇒ identical span fingerprint
    assert(r1.getString(5) == r2.getString(5))
  }

  test("consecutive duplicated grams merge into one maximal span") {
    val d = Seq(
      doc(4, shared ++ (1 to 20).map(i => s"und$i")),
      doc(5, (1 to 7).map(i => s"une$i") ++ shared)
    ).toDF("doc_id", "text")

    val rows = DocQueries.substringSpans(d, W)
      .orderBy("doc_id").collect()
    // 60 shared tokens ⇒ 11 duplicated grams each, merged to ONE span
    assert(rows.length == 2)
    val Array(r4, r5) = rows
    assert((r4.getLong(1), r4.getLong(2), r4.getLong(6)) == ((1L, 60L, 11L)))
    assert((r5.getLong(1), r5.getLong(2), r5.getLong(6)) == ((8L, 67L, 11L)))
    assert(r4.getString(5) == r5.getString(5))
  }

  test("disjoint duplicated runs stay separate spans") {
    val runA = (1 to 50).map(i => s"runa$i")
    val runB = (1 to 50).map(i => s"runb$i")
    val d = Seq(
      doc(6, runA ++ (1 to 9).map(i => s"gap$i") ++ runB),
      doc(7, runA ++ (1 to 30).map(i => s"unf$i")),
      doc(8, (1 to 30).map(i => s"ung$i") ++ runB)
    ).toDF("doc_id", "text")

    val spans = DocQueries.substringSpans(d, W)
      .orderBy("doc_id", "tok_start").collect()
    val byDoc = spans.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byDoc == Map(6L -> 2, 7L -> 1, 8L -> 1))
    val d6 = spans.filter(_.getLong(0) == 6L)
    assert(d6.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 50L), (60L, 109L)))
  }

  test("dropSpans keeps the canonical copy and cuts the rest, token-aligned") {
    val d = Seq(
      doc(1, shared.take(50) ++ (1 to 30).map(i => s"una$i")),
      doc(2, (1 to 10).map(i => s"unb$i") ++ shared.take(50) ++ (1 to 5).map(i => s"unc$i")),
      doc(3, (1 to 80).map(i => s"solo$i"))
    ).toDF("doc_id", "text")
    val out = DocQueries.dropSpans(d, W).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // doc 1 is canonical (min doc_id for the shared span): untouched
    assert(out(1L)._1 == (shared.take(50) ++ (1 to 30).map(i => s"una$i")).mkString(" "))
    assert(out(1L)._2 == 0L)
    // doc 2 loses exactly the 50 shared tokens, head and tail survive
    assert(out(2L)._1 ==
      ((1 to 10).map(i => s"unb$i") ++ (1 to 5).map(i => s"unc$i")).mkString(" "))
    assert(out(2L)._2 == 50L)
    // doc 3 has no duplicated span: identity
    assert(out(3L)._1 == (1 to 80).map(i => s"solo$i").mkString(" "))
    assert(out(3L)._2 == 0L)
  }

  test("dropSpans merges overlapping drop ranges before cutting") {
    // doc 6 shares runA with doc 4 (canonical) and runB with doc 5
    // (canonical); in doc 6 the two 50-token spans overlap by 10 tokens
    val runA = (1 to 50).map(i => s"ova$i")
    val runB = (1 to 50).map(i => s"ovb$i")
    val d = Seq(
      doc(4, runA ++ (1 to 9).map(i => s"pad$i")),
      doc(5, runB ++ (1 to 9).map(i => s"qad$i")),
      doc(6, runA.take(40) ++ runB.take(50) ++ (1 to 3).map(i => s"tail$i"))
    ).toDF("doc_id", "text")
    // doc 6 duplicates runB fully ([41, 90]); runA only partially (40
    // tokens < W) so only the runB span drops — but if BOTH dropped,
    // overlap merging must still cut each token once
    val out = DocQueries.dropSpans(d, W).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(6L)._2 == 50L)
    assert(out(6L)._1 ==
      (runA.take(40) ++ (1 to 3).map(i => s"tail$i")).mkString(" "))
    assert(out(4L)._2 == 0L && out(5L)._2 == 0L)
  }

  test("rolling gram hash equals a per-window polynomial fold") {
    import org.apache.spark.sql.functions._
    import graft.functions.RollingHash.rolling_hash
    import graft.functions.WindowPolyHash.window_poly_hash
    import graft.functions.RollingMod

    val words = (1 to 23).map(i => s"w${i * 37}")
    val rolled = Seq(Tuple1(words)).toDF("tk")
      .select(window_poly_hash(transform(col("tk"), t => rolling_hash(t)), 5))
      .head().getSeq[Long](0)

    val tokHashes = words.map(w => RollingMod.hashBytes(w.getBytes("UTF-8")))
    val expected = tokHashes.sliding(5).map(_.foldLeft(0L)((h, x) => {
      val m = RollingMod.mulMod(h, graft.functions.WindowPolyHash.WindowBase) + x
      if (m >= RollingMod.Mod) m - RollingMod.Mod else m
    })).toSeq
    assert(rolled == expected)

    // shorter-than-window input produces an empty gram array, not a crash
    val empty = Seq(Tuple1(Seq("a", "b"))).toDF("tk")
      .select(window_poly_hash(transform(col("tk"), t => rolling_hash(t)), 5))
      .head().getSeq[Long](0)
    assert(empty.isEmpty)
  }
}
