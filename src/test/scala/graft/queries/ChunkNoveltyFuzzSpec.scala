package graft.queries

import scala.util.Random

import graft.SparkSpec

/** Randomized cross-checks of the chunking/novelty operators against
  * brute-force Scala models (the TextOpsFuzzSpec pattern): small vocab
  * forces natural window collisions, doc lengths straddle the W=32/S=24
  * chunk boundaries, and verbatim copies exercise the first-owner rule.
  * Seeded Random keeps every run reproducible.
  */
class ChunkNoveltyFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260814L)

  private def randomCorpus(): Seq[(Long, Seq[String])] = {
    val vocabSize = 1 + rnd.nextInt(8)
    def tok() = s"t${rnd.nextInt(vocabSize)}"
    val base = (0 until 3 + rnd.nextInt(4)).map { id =>
      // lengths hit <32, exactly 32, and multi-window cases
      val n = 5 + rnd.nextInt(60)
      id.toLong -> Seq.fill(n)(tok())
    }
    // one verbatim copy so cross-doc duplication always exists
    base :+ (base.length.toLong -> base(rnd.nextInt(base.length))._2)
  }

  private def writeDocs(docs: Seq[(Long, Seq[String])]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("cnfuzz").toString
    docs.map { case (id, tk) => (id, tk.mkString(" "), "en", "s") }
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  /** Brute-force chunk model mirroring chunk_documents: stride-24 windows
    * of ≤32 tokens, last start at ⌈(n−32)/24⌉·24 (≥0).
    */
  private def chunks(tk: Seq[String]): Seq[String] = {
    val n = tk.length
    if (n == 0) Seq.empty
    else {
      val lastStart = math.max(0, ((n - 32 + 23) / 24) * 24)
      (0 to lastStart by 24).map(s => tk.slice(s, s + 32).mkString(" "))
    }
  }

  test("dedup_chunk_exact matches the brute-force chunk model on random corpora") {
    (1 to 5).foreach { round =>
      val corpus = randomCorpus()
      val model = corpus
        .flatMap { case (id, tk) => chunks(tk).map(c => (c, id)) }
        .groupBy(_._1)
        .filter(_._2.size > 1)
        .map { case (_, occ) =>
          (occ.size.toLong, occ.map(_._2).distinct.size.toLong, occ.map(_._2).min)
        }
        .groupBy(identity).view.mapValues(_.size).toMap
      val out = graft.SparkEntry.queries("dedup_chunk_exact")(spark, writeDocs(corpus))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(out == model, s"round $round: $out vs $model")
    }
  }

  test("ngram_novelty matches the brute-force first-owner model on random corpora") {
    (1 to 5).foreach { round =>
      val corpus = randomCorpus()
      val grams = corpus.map { case (id, tk) =>
        id -> tk.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSeq.distinct
      }
      val firstOwner = grams.flatMap { case (id, gs) => gs.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      val model = grams.collect { case (id, gs) if gs.nonEmpty =>
        val novel = gs.count(g => firstOwner(g) == id)
        id -> ((gs.size.toLong, novel.toLong))
      }.toMap
      val out = graft.SparkEntry.queries("ngram_novelty")(spark, writeDocs(corpus))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(out == model, s"round $round")
    }
  }
}
