package graft.queries

import scala.util.Random

import graft.SparkSpec

/** Randomized cross-checks of the span/fingerprint operators against
  * brute-force Scala models — the planted specs pin exact cases; this
  * sweeps corpus shapes (shared runs at document edges, multiple docs
  * sharing one run, runs of exactly window width, repeated tokens).
  * Seeded Random keeps every run reproducible.
  */
class TextOpsFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260812L)

  /** Brute-force maximal duplicated spans: positions whose w-token gram
    * (as a string) occurs in ≥2 distinct docs, merged into islands.
    */
  private def spanModel(docs: Seq[(Long, Seq[String])], w: Int): Set[(Long, Long, Long)] = {
    val grams = docs.flatMap { case (id, tk) =>
      if (tk.length < w) Seq.empty
      else tk.sliding(w).zipWithIndex.map { case (g, i) => (g.mkString(" "), id, i) }
    }
    val dup = grams.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
    docs.flatMap { case (id, tk) =>
      val pos = (if (tk.length < w) Seq.empty
                 else tk.sliding(w).zipWithIndex.collect {
                   case (g, i) if dup(g.mkString(" ")) => i
                 }.toSeq)
      // merge consecutive positions into maximal islands
      val islands = pos.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
        case (acc, p)                          => (p, p) :: acc
      }.reverse
      islands.map { case (s, e) => (id, (s + 1).toLong, (e + w).toLong) }
    }.toSet
  }

  private def randomCorpus(): Seq[(Long, Seq[String])] = {
    val vocabSize = 1 + rnd.nextInt(12) // small vocab → natural collisions
    def tok() = s"t${rnd.nextInt(vocabSize)}"
    val shared = Seq.fill(5 + rnd.nextInt(10))(tok())
    (0 until 4 + rnd.nextInt(4)).map { id =>
      val base = Seq.fill(rnd.nextInt(40))(tok())
      val doc =
        if (rnd.nextBoolean()) {
          val at = rnd.nextInt(base.length + 1)
          base.take(at) ++ shared ++ base.drop(at) // plant the shared run
        } else base
      (id.toLong, doc)
    }
  }

  test("substringSpans matches the brute-force model on 25 random corpora") {
    val w = 5
    (1 to 25).foreach { trial =>
      val corpus = randomCorpus().filter(_._2.nonEmpty)
      val df = corpus.map { case (id, tk) => (id, tk.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = DocQueries.substringSpans(df, w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val exp = spanModel(corpus, w)
      assert(got == exp, s"trial $trial corpus=$corpus")
    }
  }

  test("winnow fingerprints match the model on 25 random docs") {
    val P = BigInt("2305843009213693951")
    def tokHash(t: String): BigInt =
      t.getBytes("UTF-8").foldLeft(BigInt(0))((h, b) => (h * 257 + (b & 0xff)) mod P)
    def model(toks: Seq[String]): Set[(Long, Long)] = {
      val gh = toks.map(tokHash).sliding(3)
        .map(_.reduceLeft((h, x) => (h * 1000003 + x) mod P)).toSeq
      (0 to gh.length - 4).map { j =>
        val sl = gh.slice(j, j + 4)
        val mn = sl.min
        ((j + sl.lastIndexOf(mn) + 1).toLong, mn.toLong)
      }.toSet
    }
    (1 to 25).foreach { trial =>
      val vocab = 1 + rnd.nextInt(6) // tiny vocab → many hash ties
      val toks = Seq.fill(6 + rnd.nextInt(60))(s"w${rnd.nextInt(vocab)}")
      val got = DocQueries.winnowFingerprints(Seq((1L, toks.mkString(" "))).toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      assert(got == model(toks), s"trial $trial toks=$toks")
    }
  }
}
