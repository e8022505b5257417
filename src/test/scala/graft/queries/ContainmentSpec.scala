package graft.queries

import scala.math.BigDecimal.RoundingMode

import graft.SparkSpec

/** Asymmetric containment dedup: planted near-subset docs, threshold
  * boundary behavior, and — the load-bearing claim — LOSSLESSNESS of the
  * df-ordered prefix filter, cross-checked against a brute-force all-pairs
  * model on random small-vocabulary corpora (high gram-collision pressure).
  */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  /** All-pairs reference model: C(A→B) = |A∩B| / |A| over distinct 3-gram
    * shingle sets, rounded HALF_UP to 6 dp like the engine.
    */
  private def brute(docs: Seq[(Long, String)], t: Double): Set[(Long, Long, Double)] = {
    def sh(s: String): Set[String] = {
      val tk = s.split(" ", -1)
      if (tk.length < 3) Set.empty
      else tk.sliding(3).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, tx) => id -> sh(tx) }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets
      (b, sb) <- sets
      if a != b
      c = BigDecimal((sa & sb).size.toDouble / sa.size)
        .setScale(6, RoundingMode.HALF_UP)
        .toDouble
      if c >= t
    } yield (a, b, c)).toSet
  }

  private def run(docs: Seq[(Long, String)], t: Double): Set[(Long, Long, Double)] =
    DocQueries
      .containmentPairs(docs.toDF("doc_id", "text"), t)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet

  test("a doc embedded verbatim in a longer doc is a full-containment pair") {
    val core = (1 to 30).map(i => s"core$i").mkString(" ")
    val docs = Seq(
      1L -> core,
      2L -> ((1 to 40).map(i => s"pad$i").mkString(" ") + " " + core),
      3L -> (1 to 50).map(i => s"other$i").mkString(" ")
    )
    val got = run(docs, 0.8)
    // A⊂B ⇒ C(A→B) = 1.0; the reverse direction is ~28/96 and filtered.
    assert(got == Set((1L, 2L, 1.0)))
  }

  test("containment is asymmetric: both directions emitted for near-equal docs") {
    val core = (1 to 40).map(i => s"eq$i").mkString(" ")
    val docs = Seq(1L -> core, 2L -> (core + " tail1"))
    val got  = run(docs, 0.8)
    assert(got.map(p => (p._1, p._2)) == Set((1L, 2L), (2L, 1L)))
    assert(got.find(_._1 == 1L).get._3 == 1.0) // smaller fully contained
    assert(got.find(_._1 == 2L).get._3 < 1.0)  // larger not fully contained
  }

  test("prefix filter is lossless vs brute force on random low-vocab corpora") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 14) {
      // vary vocabulary size: smaller vocab = heavier gram collisions =
      // more candidate pressure on the prefix filter
      val vocab = (1 to (8 + trial % 3 * 4)).map(i => s"w$i")
      val base  = Seq.fill(20 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
      val docs = (0 until 14).map { id =>
        val body =
          if (id % 3 == 0) base // exact copies
          else if (id % 3 == 1)
            Seq.fill(rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size))) ++
              base.drop(rnd.nextInt(4)) // contained with noise head
          else Seq.fill(25 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size)))
        id.toLong -> body.mkString(" ")
      }
      for (t <- Seq(0.6, 0.8)) {
        val expected = brute(docs, t)
        val got      = run(docs, t)
        assert(got == expected, s"trial=$trial t=$t")
      }
    }
  }
}
